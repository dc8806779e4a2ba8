"""AOT Mosaic-lowerability smoke tests (no TPU needed).

Round 3 shipped a pallas kernel (`ops/pdf_merge.py`) whose jaxpr used a
primitive Mosaic could not lower (`dynamic_slice` with a dynamic lane
start); interpret-mode tests and the CPU dryrun sailed past it, and the
failure surfaced only on the first real-TPU claim — costing the round's
measurement window. Lowering errors like that are raised by
`lower_jaxpr_to_module`, which is platform-code that runs at *lowering*
time, so `jax.export(..., platforms=["tpu"])` reproduces them on a CPU
host. These tests AOT-lower every production kernel surface for the TPU
platform so the next unsupported primitive fails in pytest instead of
burning a 30-minute TPU claim.

This does NOT replace hardware equality runs (Mosaic can still
*miscompile* what it lowers — see the round-1 mixed-precision bug);
it only guarantees the lowering itself succeeds.
"""

import jax
import numpy as np
import pytest
from jax import export as jax_export

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.data import synthetic
from consistentnerf_tpu.data.pipeline import MipBatcher, VanillaBatcher
from consistentnerf_tpu.models.factory import make_model
from consistentnerf_tpu.train import loop as loop_lib


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(n_views=6, H=48, W=48).to_scene_data()


def _lower_tpu(fn, *args):
    """AOT-lower `fn(*args)` for the TPU platform; returns the module."""
    from consistentnerf_tpu.ops import fused_mlp as fm

    with fm.force_interpret(False):
        exported = jax_export.export(jax.jit(fn), platforms=["tpu"])(*args)
    module = exported.mlir_module()
    # A production kernel surface must actually contain Mosaic kernels —
    # guard against silently testing an all-XLA fallback path.
    assert "tpu_custom_call" in module, "no Mosaic kernel in lowering"
    return module


def _vanilla_cfg(**kw):
    base = dict(
        backbone="vanilla",
        netdepth=2,
        netwidth=32,
        N_samples=16,
        N_importance=8,
        multires=4,
        multires_views=2,
        N_rand=192,
        n_patches=1,
        patch_size=8,
        white_bkgd=True,
        near=2.0,
        far=6.0,
        use_tensorboard=False,
        hardmask=True,
        with_depth_loss=True,
        perturb=0.0,
        use_fused_train=True,
        use_onepass_train=True,
        fused_tile=64,
        compute_dtype="bfloat16",
    )
    base.update(kw)
    return Config(**base)


def _mip_cfg(**kw):
    base = dict(
        backbone="mipnerf",
        netdepth=2,
        netwidth=32,
        mip_num_samples=8,
        max_deg_point=4,
        disable_normals=True,
        N_rand=64,
        white_bkgd=True,
        use_tensorboard=False,
        randomized=True,
        use_fused_train=True,
        use_onepass_train=True,
        fused_tile=64,
        compute_depth_metrics=True,
        use_hardmask=True,
        dataset_type="blender",
        compute_dtype="bfloat16",
    )
    base.update(kw)
    return Config(**base)


def _vanilla_step_args(scene, cfg):
    model = make_model(cfg)
    batch = VanillaBatcher(scene, cfg).next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    return state, batch, jax.random.PRNGKey(0)


@pytest.mark.parametrize(
    "kw",
    [
        {},  # flagship: hardmask + depth + patches (XLA resampler)
        {"use_noise": True},
        {"ss_loss": True},
        {"use_pdf_kernel": True},
    ],
    ids=["plain", "use_noise", "ss_loss", "pdfk"],
)
def test_onepass_vanilla_step_lowers_for_tpu(scene, kw):
    from consistentnerf_tpu.ops import fused_onepass as op

    cfg = _vanilla_cfg(**kw)
    state, batch, key = _vanilla_step_args(scene, cfg)
    step = op.build_onepass_vanilla_train_step(cfg, donate=False, tile=64)
    _lower_tpu(step, state, batch, key)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"density_noise": 1.0},
        {"use_pdf_kernel": True},
    ],
    ids=["plain", "density_noise", "pdfk"],
)
def test_onepass_mip_step_lowers_for_tpu(scene, kw):
    from consistentnerf_tpu.ops import fused_onepass as op

    cfg = _mip_cfg(**kw)
    model = make_model(cfg)
    batch = MipBatcher(scene, cfg).next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    step = op.build_onepass_mip_train_step(cfg, donate=False, tile=64)
    _lower_tpu(step, state, batch, jax.random.PRNGKey(0))


def test_fused_twocall_vanilla_step_lowers_for_tpu(scene):
    from consistentnerf_tpu.ops.fused_train import (
        build_fused_vanilla_train_step,
    )

    cfg = _vanilla_cfg(use_onepass_train=False)
    state, batch, key = _vanilla_step_args(scene, cfg)
    step = build_fused_vanilla_train_step(cfg, donate=False, tile=64)
    _lower_tpu(step, state, batch, key)


def test_fused_twocall_mip_step_lowers_for_tpu(scene):
    from consistentnerf_tpu.ops.fused_train import build_fused_mip_train_step

    cfg = _mip_cfg(use_onepass_train=False)
    model = make_model(cfg)
    batch = MipBatcher(scene, cfg).next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    step = build_fused_mip_train_step(cfg, donate=False, tile=64)
    _lower_tpu(step, state, batch, jax.random.PRNGKey(0))


@pytest.mark.parametrize("onepass", [False, True],
                         ids=["twostage", "onepass"])
def test_fused_render_lowers_for_tpu(scene, onepass):
    from consistentnerf_tpu.train import evaluation
    from consistentnerf_tpu.train import render as render_lib

    cfg = _vanilla_cfg(
        use_onepass_train=False,
        use_fused_render=True,
        use_onepass_render=onepass,
        render_chunk_size=256,
    )
    model = make_model(cfg)
    batch = VanillaBatcher(scene, cfg).next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    rays = evaluation.camera_rays_for_view(scene, scene.poses[0])
    fn = render_lib.build_render_fn(model, cfg, state.params)
    _lower_tpu(fn, rays)


def test_fused_mip_render_lowers_for_tpu(scene):
    from consistentnerf_tpu.train import evaluation
    from consistentnerf_tpu.train import render as render_lib

    cfg = _mip_cfg(use_onepass_train=False, use_fused_render=True,
                   render_chunk_size=256)
    model = make_model(cfg)
    batch = MipBatcher(scene, cfg).next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    rays = evaluation.camera_rays_for_view(scene, scene.poses[0])
    fn = render_lib.build_render_fn(model, cfg, state.params)
    _lower_tpu(fn, rays)


def test_pdf_merge_kernels_lower_for_tpu():
    """The exact surface that broke on real Mosaic in round 3:
    ops/pdf_merge.py's inverse-CDF + merge / mip resampler kernels."""
    import jax.numpy as jnp

    from consistentnerf_tpu.ops import pdf_merge

    n, s_c, s_i = 192, 16, 8
    rs = np.random.RandomState(0)
    z_c = jnp.asarray(np.sort(rs.rand(n, s_c).astype(np.float32), axis=1))
    w = jnp.asarray(np.abs(rs.rand(n, s_c - 2).astype(np.float32)))
    u = jnp.asarray(np.sort(rs.rand(n, s_i).astype(np.float32), axis=1))

    def run_merge(z_c, w, u):
        return pdf_merge.sample_pdf_merged(z_c, w, u, interpret=False)

    _lower_tpu(run_merge, z_c, w, u)

    sp1 = s_c + 1
    t_vals = jnp.asarray(np.sort(rs.rand(n, sp1).astype(np.float32),
                                 axis=1))
    w2 = jnp.asarray(np.abs(rs.rand(n, s_c).astype(np.float32)))
    u2 = jnp.asarray(np.sort(rs.rand(n, sp1).astype(np.float32), axis=1))

    def run_mip(t_vals, w2, u2, pad):
        return pdf_merge.mip_resample_t_vals(t_vals, w2, u2, pad,
                                             interpret=False)

    _lower_tpu(run_mip, t_vals, w2, u2, jnp.float32(0.01))
