"""Checkpoint export to the reference .tar format: round-trips exactly,
strict-loads into a module with the reference's layer names, and the
exported weights compute the same function."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from consistentnerf_tpu.cli.export_torch_ckpt import (
    export_checkpoint,
    flax_to_state_dict,
)
from consistentnerf_tpu.cli.import_torch_ckpt import (
    import_checkpoint,
    state_dict_to_flax,
)
from tests.test_torch_ckpt_import import (
    _make_reference_state_dict,
    _torch_forward,
)


class _RefNeRF(torch.nn.Module):
    """The reference NeRF module layout (run_nerf_helpers.py:67-130):
    same layer names/shapes so load_state_dict(strict=True) validates
    exported key sets exactly."""

    def __init__(self, depth=8, width=64, in_ch=63, in_views=27,
                 skips=(4,)):
        super().__init__()
        layers = [torch.nn.Linear(in_ch, width)]
        for i in range(depth - 1):
            fan_in = width + in_ch if i in skips else width
            layers.append(torch.nn.Linear(fan_in, width))
        self.pts_linears = torch.nn.ModuleList(layers)
        self.views_linears = torch.nn.ModuleList(
            [torch.nn.Linear(width + in_views, width // 2)]
        )
        self.feature_linear = torch.nn.Linear(width, width)
        self.alpha_linear = torch.nn.Linear(width, 1)
        self.rgb_linear = torch.nn.Linear(width // 2, 3)
        self.temp_rgb = torch.nn.Parameter(torch.tensor([-0.7]))
        self.temp_depth = torch.nn.Parameter(torch.tensor([-0.7]))
        self.depth_scale = torch.nn.Parameter(torch.tensor([1.0]))


def test_round_trip_exact():
    rng = np.random.RandomState(0)
    sd = _make_reference_state_dict(rng, width=32)
    back = flax_to_state_dict(state_dict_to_flax(sd), net_depth=8)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k].numpy(), sd[k].numpy())


def _init_flax_params(width=64, depth=8):
    from consistentnerf_tpu.configs import Config
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import step as step_lib

    cfg = Config(backbone="vanilla", netwidth=width, netdepth=depth,
                 netwidth_fine=width, netdepth_fine=depth,
                 N_samples=4, N_importance=2)
    model = make_model(cfg)
    n = 8
    d = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (n, 1))
    rays = step_lib.rays_from_batch(
        {"origins": jnp.zeros((n, 3)), "directions": jnp.asarray(d)},
        cfg.near, cfg.far,
    )
    return model.init(jax.random.PRNGKey(0), None, rays)


def test_strict_load_and_function_equality():
    params = _init_flax_params(width=64)
    sd = flax_to_state_dict(params["params"]["fine"], net_depth=8)

    ref = _RefNeRF(width=64)
    ref.load_state_dict(sd, strict=True)  # raises on any key mismatch

    rng = np.random.RandomState(3)
    pts = rng.randn(17, 63).astype(np.float32)
    views = rng.randn(17, 27).astype(np.float32)
    expected = _torch_forward(
        sd, torch.tensor(pts), torch.tensor(views)
    ).detach().numpy()

    from consistentnerf_tpu.models.mlp import NeRFMLP

    mlp = NeRFMLP(net_depth=8, net_width=64)
    got = np.asarray(mlp.apply(
        {"params": params["params"]["fine"]}, jnp.array(pts),
        jnp.array(views),
    ))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


def test_exported_tar_imports_back(tmp_path):
    params = _init_flax_params(width=32)
    path = str(tmp_path / "020000.tar")
    export_checkpoint(params, 20000, path)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["global_step"] == 20000
    assert "optimizer_state_dict" in ckpt  # reference dict shape

    back, step = import_checkpoint(path)
    assert step == 20000
    for level in ("coarse", "fine"):
        orig = params["params"][level]
        got = back["params"][level]
        flat_o = jax.tree_util.tree_leaves_with_path(orig)
        flat_b = {jax.tree_util.keystr(p): v
                  for p, v in jax.tree_util.tree_leaves_with_path(got)}
        assert len(flat_o) == len(flat_b)
        for p, v in flat_o:
            np.testing.assert_array_equal(
                np.asarray(v), flat_b[jax.tree_util.keystr(p)]
            )
