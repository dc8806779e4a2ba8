"""One-pass train megakernel tests (ops.fused_onepass).

The megakernel computes MLP forward + compositing + per-ray loss
cotangents + MLP backward in a single pallas call; these tests pin it
against the composed XLA oracle (kernel level) and against the XLA
train step (full-step level, loss + updated params).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.core import rendering
from consistentnerf_tpu.data import synthetic
from consistentnerf_tpu.data.pipeline import VanillaBatcher
from consistentnerf_tpu.models.factory import make_model
from consistentnerf_tpu.models.mlp import NeRFMLP
from consistentnerf_tpu.ops import fused_mlp as fm
from consistentnerf_tpu.ops import fused_onepass as op
from consistentnerf_tpu.parallel import create_mesh, shard_batch
from consistentnerf_tpu.train import loop as loop_lib
from consistentnerf_tpu.train import step as step_lib


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(n_views=6, H=48, W=48).to_scene_data()


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
        fused_tile=64,
    )
    base.update(kw)
    return Config(**base)


def test_onepass_level_matches_composed_oracle():
    """onepass_level_T == XLA MLP -> raw2outputs_T -> per-ray MSE grads."""
    net_depth, width, skips, multires, mv = 4, 32, (2,), 4, 2
    n_rays, seg = 12, 16
    mlp = NeRFMLP(net_depth=net_depth, net_width=width, skips=skips)
    pe_dim = 3 * (1 + 2 * multires)
    ve_dim = 3 * (1 + 2 * mv)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((2, pe_dim)),
                      jnp.zeros((2, ve_dim)))
    weights = [jnp.asarray(w)
               for w in fm.flatten_params(params, True, net_depth)]
    weights = tuple(w[None, :] if w.ndim == 1 else w for w in weights)

    k = jax.random.split(jax.random.PRNGKey(1), 8)
    o = jax.random.normal(k[0], (n_rays, 3))
    d = jax.random.normal(k[1], (n_rays, 3))
    z = jnp.sort(jax.random.uniform(k[2], (n_rays, seg)) * 4 + 2, -1)
    target = jax.random.uniform(k[3], (n_rays, 3))
    prior = jax.random.uniform(k[4], (n_rays,)) * 4 + 2
    coeff_rgb = jax.random.uniform(k[5], (n_rays,))
    coeff_d = jax.random.uniform(k[6], (n_rays,))
    viewdirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    dnorm = jnp.linalg.norm(d, axis=-1)

    pts = o[:, None] + d[:, None] * z[..., None]  # [N, S, 3]
    pts_T = pts.reshape(-1, 3).T
    views_T = jnp.broadcast_to(
        viewdirs[:, None], (n_rays, seg, 3)
    ).reshape(-1, 3).T

    def oracle(ws):
        flat = [w[0] if (w.ndim == 2 and w.shape[0] == 1) else w
                for w in ws]
        raw = fm._mlp_body(
            pts.reshape(-1, 3), views_T.T, flat, net_depth=net_depth,
            skips=skips, multires=multires, multires_views=mv,
            use_viewdirs=True,
        )
        raw_T = raw.T.reshape(4, n_rays, seg)
        rgb, _, acc, w_, depth = rendering.raw2outputs_T(
            raw_T, z, d, None, True)
        loss = (jnp.sum(coeff_rgb[:, None] / 2 * (rgb - target) ** 2)
                + jnp.sum(coeff_d / 2 * (depth - prior) ** 2))
        return loss, (rgb, depth, acc, w_)

    (_, (rgb_o, depth_o, acc_o, w_o)), g_o = jax.value_and_grad(
        oracle, has_aux=True)(weights)

    rep = lambda x: op._rep_row(x, seg)  # noqa: E731
    out_rows, d_ws = op.onepass_level_T(
        weights, pts_T, views_T, z.reshape(1, -1), rep(dnorm),
        rep(coeff_rgb), rep(target), rep(coeff_d), rep(prior),
        seg=seg, net_depth=net_depth, skips=skips, multires=multires,
        multires_views=mv, tile=256, white_bkgd=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_rows[:3, ::seg].T),
                               np.asarray(rgb_o), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_rows[3, ::seg]),
                               np.asarray(depth_o), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_rows[4, ::seg]),
                               np.asarray(acc_o), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_rows[5]).reshape(n_rays, seg),
                               np.asarray(w_o), atol=1e-5, rtol=1e-5)
    assert len(d_ws) == len(weights)
    for i, (gk, go) in enumerate(zip(d_ws, g_o)):
        np.testing.assert_allclose(
            np.asarray(gk).reshape(np.asarray(go).shape), np.asarray(go),
            atol=2e-4, rtol=2e-3, err_msg=f"weight {i}",
        )


def test_onepass_mip_level_matches_composed_oracle():
    """onepass_mip_level_T == XLA mip MLP -> compute_alpha_weights ->
    volumetric_rendering -> per-ray MSE grads."""
    from consistentnerf_tpu.models.mlp import MipMLP
    from consistentnerf_tpu.ops import fused_mip as fmip

    net_depth, skip, nf, dv = 4, 2, 6, 2
    n_rays, seg = 12, 16
    mlp = MipMLP(net_depth=net_depth, net_width=32, skip_layer=skip,
                 max_deg_point=nf, deg_view=dv, disable_normals=True)
    k = jax.random.split(jax.random.PRNGKey(5), 10)
    means = jax.random.normal(k[0], (n_rays * seg, 3))
    covs = jax.random.uniform(k[1], (n_rays * seg, 3)) * 0.1
    views = jax.random.normal(k[2], (n_rays * seg, 3))
    views = views / jnp.linalg.norm(views, axis=-1, keepdims=True)
    dirs = jax.random.normal(k[3], (n_rays, 3))
    t_vals = jnp.sort(
        jax.random.uniform(k[4], (n_rays, seg + 1)) * 4 + 2, -1
    )
    target = jax.random.uniform(k[5], (n_rays, 3))
    prior = jax.random.uniform(k[6], (n_rays,)) * 4 + 2
    coeff_rgb = jax.random.uniform(k[7], (n_rays,))
    coeff_d = jax.random.uniform(k[8], (n_rays,))
    params = mlp.init(k[9], None, (means[:2], covs[:2]), views[:2])
    weights = tuple(jnp.asarray(w) for w in
                    fmip.flatten_mip_params(params, net_depth))
    kw = dict(net_depth=net_depth, skip_layer=skip, num_freqs=nf,
              deg_view=dv)

    def oracle(ws):
        raw = fmip.reference_mip_mlp_apply(ws, means, covs, views, **kw)
        rgb_T = jax.nn.sigmoid(raw[:, :3]).T.reshape(3, n_rays, seg)
        rgb_T = rgb_T * (1 + 2 * mlp.rgb_padding) - mlp.rgb_padding
        density = jax.nn.softplus(
            raw[:, 3] + mlp.density_bias
        ).reshape(n_rays, seg)
        wts, _, _, delta = rendering.compute_alpha_weights(
            density, t_vals, dirs
        )
        rend = rendering.volumetric_rendering(
            None, wts, jnp.full((n_rays, seg, 3), jnp.nan), t_vals,
            True, 0, False, delta, rgbs_T=rgb_T,
        )
        rgb, dist = rend["rgb"], rend["distance_mean"]
        loss = (jnp.sum(coeff_rgb[:, None] / 2 * (rgb - target) ** 2)
                + jnp.sum(coeff_d / 2 * (dist - prior) ** 2))
        return loss, (rgb, dist, wts)

    (_, (rgb_o, dist_o, w_o)), g_o = jax.value_and_grad(
        oracle, has_aux=True)(weights)

    dnorm = jnp.linalg.norm(dirs, axis=-1)
    tmid = 0.5 * (t_vals[:, :-1] + t_vals[:, 1:])
    delta_r = (t_vals[:, 1:] - t_vals[:, :-1]) * dnorm[:, None]
    rep = lambda x: op._rep_row(x, seg)  # noqa: E731
    out_rows, d_ws = op.onepass_mip_level_T(
        weights, means.T, covs.T, views.T, tmid.reshape(1, -1),
        delta_r.reshape(1, -1), rep(t_vals[:, 0]), rep(t_vals[:, -1]),
        rep(coeff_rgb), rep(target), rep(coeff_d), rep(prior),
        seg=seg, white_bkgd=True, rgb_padding=mlp.rgb_padding,
        density_bias=mlp.density_bias, tile=256, interpret=True, **kw,
    )
    np.testing.assert_allclose(np.asarray(out_rows[:3, ::seg].T),
                               np.asarray(rgb_o), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_rows[3, ::seg]),
                               np.asarray(dist_o), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_rows[5]).reshape(n_rays, seg), np.asarray(w_o),
        atol=1e-5, rtol=1e-5,
    )
    assert len(d_ws) == len(weights)
    for i, (gk, go) in enumerate(zip(d_ws, g_o)):
        np.testing.assert_allclose(
            np.asarray(gk).reshape(np.asarray(go).shape), np.asarray(go),
            atol=2e-4, rtol=2e-3, err_msg=f"weight {i}",
        )


def test_onepass_mip_level_density_noise_matches_oracle():
    """The noise row shifts the in-kernel density logit exactly like the
    two-call path's raw_density + noise (fused_train.py:269-274)."""
    from consistentnerf_tpu.models.mlp import MipMLP
    from consistentnerf_tpu.ops import fused_mip as fmip

    net_depth, skip, nf, dv = 4, 2, 6, 2
    n_rays, seg = 8, 16
    mlp = MipMLP(net_depth=net_depth, net_width=32, skip_layer=skip,
                 max_deg_point=nf, deg_view=dv, disable_normals=True)
    k = jax.random.split(jax.random.PRNGKey(11), 11)
    means = jax.random.normal(k[0], (n_rays * seg, 3))
    covs = jax.random.uniform(k[1], (n_rays * seg, 3)) * 0.1
    views = jax.random.normal(k[2], (n_rays * seg, 3))
    views = views / jnp.linalg.norm(views, axis=-1, keepdims=True)
    dirs = jax.random.normal(k[3], (n_rays, 3))
    t_vals = jnp.sort(
        jax.random.uniform(k[4], (n_rays, seg + 1)) * 4 + 2, -1
    )
    target = jax.random.uniform(k[5], (n_rays, 3))
    coeff_rgb = jax.random.uniform(k[7], (n_rays,))
    noise = jax.random.normal(k[8], (n_rays, seg))
    params = mlp.init(k[9], None, (means[:2], covs[:2]), views[:2])
    weights = tuple(jnp.asarray(w) for w in
                    fmip.flatten_mip_params(params, net_depth))
    kw = dict(net_depth=net_depth, skip_layer=skip, num_freqs=nf,
              deg_view=dv)

    def oracle(ws):
        raw = fmip.reference_mip_mlp_apply(ws, means, covs, views, **kw)
        rgb_T = jax.nn.sigmoid(raw[:, :3]).T.reshape(3, n_rays, seg)
        rgb_T = rgb_T * (1 + 2 * mlp.rgb_padding) - mlp.rgb_padding
        density = jax.nn.softplus(
            raw[:, 3].reshape(n_rays, seg) + noise + mlp.density_bias
        )
        wts, _, _, delta = rendering.compute_alpha_weights(
            density, t_vals, dirs
        )
        rend = rendering.volumetric_rendering(
            None, wts, jnp.full((n_rays, seg, 3), jnp.nan), t_vals,
            True, 0, False, delta, rgbs_T=rgb_T,
        )
        loss = jnp.sum(coeff_rgb[:, None] / 2
                       * (rend["rgb"] - target) ** 2)
        return loss, rend["rgb"]

    (_, rgb_o), g_o = jax.value_and_grad(oracle, has_aux=True)(weights)

    dnorm = jnp.linalg.norm(dirs, axis=-1)
    tmid = 0.5 * (t_vals[:, :-1] + t_vals[:, 1:])
    delta_r = (t_vals[:, 1:] - t_vals[:, :-1]) * dnorm[:, None]
    rep = lambda x: op._rep_row(x, seg)  # noqa: E731
    zero = jnp.zeros((n_rays,))
    out_rows, d_ws = op.onepass_mip_level_T(
        weights, means.T, covs.T, views.T, tmid.reshape(1, -1),
        delta_r.reshape(1, -1), rep(t_vals[:, 0]), rep(t_vals[:, -1]),
        rep(coeff_rgb), rep(target), rep(zero), rep(zero),
        noise.reshape(1, -1),
        seg=seg, white_bkgd=True, rgb_padding=mlp.rgb_padding,
        density_bias=mlp.density_bias, tile=256, interpret=True, **kw,
    )
    np.testing.assert_allclose(np.asarray(out_rows[:3, ::seg].T),
                               np.asarray(rgb_o), atol=1e-5, rtol=1e-5)
    for i, (gk, go) in enumerate(zip(d_ws, g_o)):
        np.testing.assert_allclose(
            np.asarray(gk).reshape(np.asarray(go).shape), np.asarray(go),
            atol=2e-4, rtol=2e-3, err_msg=f"weight {i}",
        )


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
        randomized=False,
        use_fused_train=True,
        use_onepass_train=True,
        fused_tile=64,
        compute_depth_metrics=True,
        compute_mono_depth_metrics=False,
        use_hardmask=True,
        dataset_type="blender",
    )
    base.update(kw)
    return Config(**base)


def _mip_step_pair(scene, cfg):
    from consistentnerf_tpu.data.pipeline import MipBatcher
    from consistentnerf_tpu.ops.fused_train import (
        build_fused_mip_train_step,
    )

    model = make_model(cfg)
    batch = MipBatcher(scene, cfg).next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    ref_step = build_fused_mip_train_step(cfg, donate=False, tile=64)
    op_step = op.build_onepass_mip_train_step(cfg, donate=False, tile=64)
    key = jax.random.PRNGKey(0)
    s_r, st_r = ref_step(state, batch, key)
    s_o, st_o = op_step(state, batch, key)
    np.testing.assert_allclose(float(st_o["loss"]), float(st_r["loss"]),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_o.params),
                    jax.tree_util.tree_leaves(s_r.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=5e-3)
    return st_o, st_r


def test_onepass_mip_step_density_noise_runs(scene):
    """Step-level smoke: density_noise=1 + randomized trains with finite
    loss and noise actually engages (noise-on vs noise-off params
    differ). Exact-stream equality vs the two-call step is not expected
    (the two paths split their level rngs differently)."""
    from consistentnerf_tpu.data.pipeline import MipBatcher

    cfg = _mip_cfg(density_noise=1.0, randomized=True)
    assert op.mip_onepass_supported(cfg)
    model = make_model(cfg)
    batch = MipBatcher(scene, cfg).next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    step = op.build_onepass_mip_train_step(cfg, donate=False, tile=64)
    s1, st = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(st["loss"]))
    step_off = op.build_onepass_mip_train_step(
        cfg.replace(density_noise=0.0), donate=False, tile=64
    )
    s0, _ = step_off(state, batch, jax.random.PRNGKey(0))
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s0.params))
    ]
    assert max(diffs) > 0, "density noise had no effect"


def test_onepass_mip_step_matches_fused(scene):
    """Whole batch through the mip megakernel (mono metrics off ->
    p == 0): loss and updated params match the two-call fused step."""
    st_o, st_r = _mip_step_pair(scene, _mip_cfg())
    np.testing.assert_allclose(
        np.asarray(st_o["losses"]), np.asarray(st_r["losses"]),
        rtol=2e-4, atol=2e-4,
    )


def test_onepass_mip_step_matches_fused_mono(scene):
    """MiDaS patch term on: the first 4x16^2 rays take the
    differentiable path, grads still match the two-call fused step."""
    _mip_step_pair(scene, _mip_cfg(compute_mono_depth_metrics=True))


def test_onepass_mip_step_all_patch_rays(scene):
    """N_rand=0 with mono metrics on: every ray is a MiDaS patch ray,
    the megakernel is skipped and the whole step runs differentiably."""
    _mip_step_pair(
        scene, _mip_cfg(compute_mono_depth_metrics=True, N_rand=0)
    )


def test_mip_onepass_supported_gating():
    assert op.mip_onepass_supported(_mip_cfg())
    # density noise is supported (an input row on the in-kernel logit;
    # the paper's mipnerf3/regnerf3 presets set MLP.density_noise=1)
    assert op.mip_onepass_supported(_mip_cfg(density_noise=1.0))
    assert not op.mip_onepass_supported(_mip_cfg(disable_normals=False))
    assert not op.mip_onepass_supported(
        _mip_cfg(compute_disp_metrics=True)
    )
    assert not op.mip_onepass_supported(_mip_cfg(backbone="vanilla"))


def test_onepass_render_matches_model_apply():
    """fused_render_rays(onepass=True) — in-kernel compositing — equals
    the VanillaNeRF deterministic render."""
    from consistentnerf_tpu.core.rays import Rays
    from consistentnerf_tpu.models.nerf import VanillaNeRF
    from consistentnerf_tpu.ops import fused_render

    model = VanillaNeRF(num_samples=8, num_importance=4, multires=4,
                        multires_views=2, net_depth=2, net_width=32,
                        white_bkgd=True)
    n = 24
    key = jax.random.PRNGKey(3)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ones = jnp.ones((n, 1))
    rays = Rays(origins=jnp.zeros((n, 3)), directions=d, viewdirs=d,
                radii=ones * 1e-3, lossmult=ones, near=ones * 2.0,
                far=ones * 6.0)
    params = model.init(jax.random.PRNGKey(0), None, rays)
    expected = model.apply(params, None, rays)
    got = fused_render.fused_render_rays(
        params, rays, num_samples=8, num_importance=4, multires=4,
        multires_views=2, net_depth=2, white_bkgd=True, tile=32,
        interpret=True, onepass=True,
    )
    for k in ["rgb", "depth", "acc", "disp", "rgb0", "depth0", "disp0"]:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(expected[k]), atol=2e-4,
            rtol=2e-4, err_msg=k,
        )


def test_onepass_render_config_plumbing(scene):
    """Config.use_onepass_render routes build_render_fn through the
    in-kernel-compositing path and matches the two-stage fused render."""
    from consistentnerf_tpu.train import evaluation
    from consistentnerf_tpu.train import render as render_lib

    base = dict(N_rand=64, render_chunk_size=256, use_fused_render=True,
                fused_tile=64)
    cfg_two = _vanilla_cfg(**base)
    cfg_op = _vanilla_cfg(**base, use_onepass_render=True)
    model = make_model(cfg_two)
    batch = VanillaBatcher(scene, cfg_two).next_batch()
    state = loop_lib.init_state(cfg_two, model, batch)
    rays = evaluation.camera_rays_for_view(scene, scene.poses[0])
    out_two = render_lib.build_render_fn(model, cfg_two, state.params)(rays)
    out_op = render_lib.build_render_fn(model, cfg_op, state.params)(rays)
    for k in ("rgb", "depth", "acc", "disp"):
        np.testing.assert_allclose(
            np.asarray(out_op[k]), np.asarray(out_two[k]), atol=5e-4,
            rtol=5e-4, err_msg=k,
        )


def _step_pair(scene, cfg):
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    xla_step = step_lib.build_vanilla_train_step(model, cfg, donate=False)
    op_step = op.build_onepass_vanilla_train_step(cfg, donate=False,
                                                  tile=64)
    return state, batch, xla_step, op_step


def _assert_steps_match(state, batch, xla_step, op_step, param_atol=2e-4):
    key = jax.random.PRNGKey(0)
    s_x, st_x = xla_step(state, batch, key)
    s_o, st_o = op_step(state, batch, key)
    np.testing.assert_allclose(float(st_o["loss"]), float(st_x["loss"]),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_o.params),
                    jax.tree_util.tree_leaves(s_x.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=param_atol, rtol=5e-3)
    return st_o, st_x


def test_onepass_step_matches_xla_hardmask(scene):
    """Hardmask RGB + masked depth + patch mono/SSIM terms: loss and
    updated params match the XLA step."""
    st_o, st_x = _assert_steps_match(
        *_step_pair(scene, _vanilla_cfg())
    )
    np.testing.assert_allclose(float(st_o["img_loss"]),
                               float(st_x["img_loss"]), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(float(st_o["depth_loss"]),
                               float(st_x["depth_loss"]), rtol=2e-4,
                               atol=2e-4)


def test_onepass_step_matches_xla_plain_mse(scene):
    """Unmasked MSE family (hardmask off, with_depth_norm depth)."""
    cfg = _vanilla_cfg(hardmask=False, with_depth_norm=True)
    _assert_steps_match(*_step_pair(scene, cfg))


def test_onepass_step_matches_xla_pdf_kernel(scene):
    """The fused inverse-CDF + merge resampler (use_pdf_kernel=True —
    default-off since the round-4 A/B measured it perf-neutral, but the
    path stays equality-covered): deterministic draws bit-match the XLA
    resampler, so the whole step must match too."""
    cfg = _vanilla_cfg(use_pdf_kernel=True)
    _assert_steps_match(*_step_pair(scene, cfg))


def test_onepass_step_matches_xla_ss_loss(scene):
    """Online-reprojection term: gated fine-rgb coefficient rows +
    reference-ray megakernels; loss/ss_loss/params match the XLA step
    at perturb=0 (same rng folds)."""
    cfg = _vanilla_cfg(ss_loss=True)
    assert op.onepass_supported(cfg)
    state, batch, xla_step, op_step = _step_pair(scene, cfg)
    assert "ref_image" in batch
    st_o, st_x = _assert_steps_match(state, batch, xla_step, op_step)
    np.testing.assert_allclose(float(st_o["ss_loss"]),
                               float(st_x["ss_loss"]), rtol=2e-4,
                               atol=2e-4)


def test_onepass_step_matches_xla_ss_loss_and_noise(scene):
    """ss_loss + use_noise together (both rng streams shared)."""
    cfg = _vanilla_cfg(ss_loss=True, use_noise=True)
    state, batch, xla_step, op_step = _step_pair(scene, cfg)
    _assert_steps_match(state, batch, xla_step, op_step)


def test_onepass_step_matches_xla_ss_loss_gated(scene):
    """The use_gated=True branch (PRNGKey(0) at step 0 draws False, so
    the other ss tests never fire the coefficient-row swap): PRNGKey(2)
    draws True — the consistency-masked-MSE fine rgb coefficients must
    match the XLA step too."""
    cfg = _vanilla_cfg(ss_loss=True)
    state, batch, xla_step, op_step = _step_pair(scene, cfg)
    key = jax.random.PRNGKey(2)
    step_rng = jax.random.fold_in(key, 0)
    _, gate_rng = jax.random.split(jax.random.fold_in(step_rng, 1))
    assert bool(jax.random.bernoulli(gate_rng)), (
        "test premise: PRNGKey(2) must select the gated branch"
    )
    s_x, st_x = xla_step(state, batch, key)
    s_o, st_o = op_step(state, batch, key)
    np.testing.assert_allclose(float(st_o["loss"]), float(st_x["loss"]),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_o.params),
                    jax.tree_util.tree_leaves(s_x.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=5e-3)


def test_onepass_step_matches_xla_use_noise(scene):
    """Output noise (apply_output_noise): the noise folds into the
    megakernel's target/prior cotangent rows as a shift; same
    fold_in(step_rng, 7) stream as the XLA step, so loss and updated
    params match exactly."""
    cfg = _vanilla_cfg(use_noise=True)
    assert op.onepass_supported(cfg)
    _assert_steps_match(*_step_pair(scene, cfg))


def test_onepass_step_matches_xla_use_batching(scene):
    """use_batching mode: no patch rays, the megakernel handles the whole
    batch (p == 0 path)."""
    from consistentnerf_tpu.data.pipeline import AllImagesBatcher

    cfg = _vanilla_cfg(use_batching=True, N_rand=128)
    model = make_model(cfg)
    batcher = AllImagesBatcher(scene, cfg)
    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    xla_step = step_lib.build_vanilla_train_step(model, cfg, donate=False)
    op_step = op.build_onepass_vanilla_train_step(cfg, donate=False,
                                                  tile=64)
    _assert_steps_match(state, batch, xla_step, op_step)


def test_onepass_step_shard_map_matches_unsharded(scene):
    """With a mesh, the megakernel runs under shard_map over the data
    axis; results match the unsharded step."""
    cfg = _vanilla_cfg(N_rand=192)
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    mesh = create_mesh()
    assert mesh.size == 8
    state = loop_lib.init_state(cfg, model, batch)
    step_plain = op.build_onepass_vanilla_train_step(cfg, donate=False,
                                                     tile=64)
    step_sharded = op.build_onepass_vanilla_train_step(
        cfg, donate=False, tile=64, mesh=mesh
    )
    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)
    s_p, st_p = step_plain(state, batch, key)
    s_s, st_s = step_sharded(state, sharded, key)
    np.testing.assert_allclose(float(st_s["loss"]), float(st_p["loss"]),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_s.params),
                    jax.tree_util.tree_leaves(s_p.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_softlp_fallback_matches_xla(scene):
    """The softLpmask family falls back to the two-call fused step
    (prediction-dependent global denominators — see
    onepass_supported's docstring); that fallback must compute the
    exact XLA loss and parameter updates."""
    from consistentnerf_tpu.ops.fused_train import (
        build_fused_vanilla_train_step,
    )

    cfg = _vanilla_cfg(hardmask=False, softLpmask=True)
    assert not op.onepass_supported(cfg)
    model = make_model(cfg)
    batch = VanillaBatcher(scene, cfg).next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    xla_step = step_lib.build_vanilla_train_step(model, cfg, donate=False)
    fused_step = build_fused_vanilla_train_step(cfg, donate=False, tile=64)
    key = jax.random.PRNGKey(0)
    s_x, st_x = xla_step(state, batch, key)
    s_f, st_f = fused_step(state, batch, key)
    np.testing.assert_allclose(float(st_f["loss"]), float(st_x["loss"]),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_f.params),
                    jax.tree_util.tree_leaves(s_x.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=5e-3)


def test_onepass_supported_gating():
    assert op.onepass_supported(_vanilla_cfg())
    # use_noise and ss_loss are supported (coefficient-row treatments)
    assert op.onepass_supported(_vanilla_cfg(use_noise=True))
    assert op.onepass_supported(_vanilla_cfg(ss_loss=True))
    assert not op.onepass_supported(
        _vanilla_cfg(hardmask=False, softLpmask=True)
    )
    assert not op.onepass_supported(_vanilla_cfg(backbone="mipnerf"))
    with pytest.raises(AssertionError):
        op.build_onepass_vanilla_train_step(
            _vanilla_cfg(hardmask=False, softLpmask=True)
        )


def test_onepass_convergence(scene):
    """A few one-pass steps reduce the loss on the synthetic scene."""
    cfg = _vanilla_cfg(netwidth=32)
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    op_step = op.build_onepass_vanilla_train_step(cfg, donate=False,
                                                  tile=64)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        batch = batcher.next_batch()
        state, stats = op_step(state, batch, key)
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
