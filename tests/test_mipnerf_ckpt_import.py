"""Pretrained mip-NeRF checkpoint import (RegNeRF eval.py:100-118 remap)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.cli import import_mipnerf_ckpt as imp
from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.core.rays import Rays
from consistentnerf_tpu.models.factory import make_model


def _tiny_cfg(**kw):
    base = dict(backbone="mipnerf", netdepth=4, netwidth=32,
                mip_num_samples=8, disable_normals=True,
                use_tensorboard=False)
    base.update(kw)
    return Config(**base)


def _ref_params(cfg):
    model = make_model(cfg)
    n = 4
    ones = jnp.ones((n, 1))
    d = jnp.ones((n, 3)) / np.sqrt(3.0)
    rays = Rays(origins=jnp.zeros((n, 3)), directions=d, viewdirs=d,
                radii=ones * 1e-3, lossmult=ones, near=ones * cfg.near,
                far=ones * cfg.far)
    return model, rays, model.init(jax.random.PRNGKey(3), None, rays)


def _fake_pretrained(cfg, params):
    """Build a Google-style state dict: our Dense_i scattered into the
    pretrained 21-layer layout (bottleneck/viewdir/rgb at 18/19/20,
    junk at the dropped/ignored slots)."""
    D = cfg.netdepth
    ours = params["params"]["MipMLP_0"]
    mlp = {}
    for i in range(D + 1):  # trunk + density stay in place
        mlp[f"Dense_{i}"] = {
            "kernel": np.asarray(ours[f"Dense_{i}"]["kernel"]),
            "bias": np.asarray(ours[f"Dense_{i}"]["bias"]),
        }
    # junk layers that the remap must drop/ignore
    for i in (9, 17, 12, 13):
        if f"Dense_{i}" not in mlp or i in (9, 17):
            mlp[f"Dense_{i}"] = {"kernel": np.ones((2, 2), np.float32),
                                 "bias": np.zeros((2,), np.float32)}
    for src, dst in ((18, D + 1), (19, D + 2), (20, D + 3)):
        mlp[f"Dense_{src}"] = {
            "kernel": np.asarray(ours[f"Dense_{dst}"]["kernel"]),
            "bias": np.asarray(ours[f"Dense_{dst}"]["bias"]),
        }
    return {
        "optimizer": {
            "target": {"params": {"MLP_0": mlp}},
            "state": {"step": np.int32(250000)},
        },
        "optimizerd": {"junk": np.zeros(1)},
    }


def test_remap_and_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    model, rays, params = _ref_params(cfg)
    state_dict = _fake_pretrained(cfg, params)

    tree, step = imp.pretrained_to_params(state_dict, cfg.netdepth)
    assert step == 250000
    got = tree["params"]["MipMLP_0"]
    ref = params["params"]["MipMLP_0"]
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(got[k]["kernel"]), np.asarray(ref[k]["kernel"])
        )

    # The imported tree drives the model identically to the source.
    out_ref = model.apply(params, None, rays)
    out_got = model.apply(jax.tree_util.tree_map(jnp.asarray, tree),
                          None, rays)
    np.testing.assert_allclose(
        np.asarray(out_got[-1]["rgb"]), np.asarray(out_ref[-1]["rgb"]),
        atol=1e-6,
    )


def test_import_cli_end_to_end(tmp_path):
    """Write a flax checkpoint file, run the CLI, restore via our
    CheckpointManager."""
    from flax.training import checkpoints as flax_ckpt

    cfg = _tiny_cfg()
    model, rays, params = _ref_params(cfg)
    state_dict = _fake_pretrained(cfg, params)
    ckpt_dir = str(tmp_path / "pretrained")
    os.makedirs(ckpt_dir)
    flax_ckpt.save_checkpoint(ckpt_dir, state_dict, step=250000,
                              prefix="checkpoint_")

    out_dir = str(tmp_path / "exp")
    imp.main([
        os.path.join(ckpt_dir, "checkpoint_250000"), out_dir,
        "--set", "backbone=mipnerf", "--set", "netdepth=4",
        "--set", "netwidth=32", "--set", "disable_normals=true",
    ])

    from consistentnerf_tpu.train import checkpoints as ckpt_lib
    from consistentnerf_tpu.train.state import TrainState, make_optimizer

    tx = make_optimizer(cfg)
    template = TrainState(step=0, params=params,
                          opt_state=tx.init(params))
    mgr = ckpt_lib.CheckpointManager(os.path.join(out_dir, "checkpoints"))
    assert mgr.latest_step() == 250000
    restored = mgr.restore(template)
    mgr.close()
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
