"""Reference-checkpoint import: converted weights must compute the same
function as the torch module they came from."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from consistentnerf_tpu.cli.import_torch_ckpt import (
    import_checkpoint,
    state_dict_to_flax,
)
from consistentnerf_tpu.models.mlp import NeRFMLP


def _make_reference_state_dict(rng, depth=8, width=256, in_ch=63,
                               in_views=27):
    """A state_dict with the reference's layer names/shapes
    (run_nerf_helpers.NeRF, skips=[4])."""
    sd = {}

    def lin(name, fan_in, fan_out):
        sd[f"{name}.weight"] = torch.tensor(
            rng.randn(fan_out, fan_in).astype(np.float32) * 0.05
        )
        sd[f"{name}.bias"] = torch.tensor(
            rng.randn(fan_out).astype(np.float32) * 0.05
        )

    lin("pts_linears.0", in_ch, width)
    for i in range(1, depth):
        fan_in = width + in_ch if i == 5 else width  # layer after skip@4
        lin(f"pts_linears.{i}", fan_in, width)
    lin("alpha_linear", width, 1)
    lin("feature_linear", width, width)
    lin("views_linears.0", width + in_views, width // 2)
    lin("rgb_linear", width // 2, 3)
    sd["temp_rgb"] = torch.tensor([-0.7])
    sd["temp_depth"] = torch.tensor([-0.7])
    sd["depth_scale"] = torch.tensor([1.0])
    return sd


def _torch_forward(sd, pts_embed, views_embed, depth=8, skips=(4,)):
    """run_nerf_helpers.NeRF.forward semantics on a raw state_dict."""
    h = pts_embed
    for i in range(depth):
        h = torch.relu(
            h @ sd[f"pts_linears.{i}.weight"].T + sd[f"pts_linears.{i}.bias"]
        )
        if i in skips:
            h = torch.cat([pts_embed, h], -1)
    alpha = h @ sd["alpha_linear.weight"].T + sd["alpha_linear.bias"]
    feature = h @ sd["feature_linear.weight"].T + sd["feature_linear.bias"]
    h = torch.cat([feature, views_embed], -1)
    h = torch.relu(
        h @ sd["views_linears.0.weight"].T + sd["views_linears.0.bias"]
    )
    rgb = h @ sd["rgb_linear.weight"].T + sd["rgb_linear.bias"]
    return torch.cat([rgb, alpha], -1)


def test_state_dict_conversion_function_equality():
    rng = np.random.RandomState(0)
    depth, width = 8, 64
    sd = _make_reference_state_dict(rng, depth=depth, width=width,
                                    in_ch=63, in_views=27)
    flax_sub = state_dict_to_flax(sd, net_depth=depth)
    params = {"params": flax_sub}

    pts = rng.randn(17, 63).astype(np.float32)
    views = rng.randn(17, 27).astype(np.float32)

    expected = _torch_forward(
        sd, torch.tensor(pts), torch.tensor(views), depth
    ).numpy()

    mlp = NeRFMLP(net_depth=depth, net_width=width)
    got = np.asarray(mlp.apply(params, jnp.array(pts), jnp.array(views)))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)
    # temperature scalars came along
    np.testing.assert_allclose(np.asarray(flax_sub["temp_rgb"]), [-0.7])


def test_import_checkpoint_tar(tmp_path):
    rng = np.random.RandomState(1)
    sd_c = _make_reference_state_dict(rng, width=32)
    sd_f = _make_reference_state_dict(rng, width=32)
    path = str(tmp_path / "010000.tar")
    torch.save(
        {
            "global_step": 10000,
            "network_fn_state_dict": sd_c,
            "network_fine_state_dict": sd_f,
        },
        path,
    )
    params, step = import_checkpoint(path)
    assert step == 10000
    assert "coarse" in params["params"] and "fine" in params["params"]
    assert params["params"]["fine"]["pts_0"]["kernel"].shape == (63, 32)
