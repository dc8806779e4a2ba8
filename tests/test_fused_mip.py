"""Aligned fused MipMLP kernels vs the flax MipMLP oracle (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from consistentnerf_tpu.models.mlp import MipMLP
from consistentnerf_tpu.ops import fused_mip


def _setup(net_depth=4, width=32, skip=2, max_deg=6, deg_view=2, n=96,
           seed=0):
    mlp = MipMLP(
        net_depth=net_depth, net_width=width, skip_layer=skip,
        max_deg_point=max_deg, deg_view=deg_view, disable_normals=True,
    )
    k = jax.random.PRNGKey(seed)
    means = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    covs = jax.random.uniform(jax.random.fold_in(k, 2), (n, 3)) * 0.1
    views = jax.random.normal(jax.random.fold_in(k, 3), (n, 3))
    views = views / jnp.linalg.norm(views, axis=-1, keepdims=True)
    params = mlp.init(k, None, (means[:2], covs[:2]), views[:2])
    weights = [jnp.asarray(w) for w in
               fused_mip.flatten_mip_params(params, net_depth)]
    return mlp, params, weights, means, covs, views, dict(
        net_depth=net_depth, skip_layer=skip, num_freqs=max_deg,
        deg_view=deg_view,
    )


def _activate(raw, mlp):
    """Apply the out-of-kernel activations to the raw [N,4] output."""
    rgb = jax.nn.sigmoid(raw[:, :3])
    rgb = rgb * (1 + 2 * mlp.rgb_padding) - mlp.rgb_padding
    density = jax.nn.softplus(raw[:, 3] + mlp.density_bias)
    return rgb, density


def test_fused_mip_forward_matches_flax():
    mlp, params, weights, means, covs, views, cfg = _setup()
    rgb_ref, dens_ref, _ = mlp.apply(params, None, (means, covs), views)
    raw = fused_mip.fused_mip_mlp_train(
        weights, means, covs, views, cfg["net_depth"], cfg["skip_layer"],
        cfg["num_freqs"], cfg["deg_view"], 32, True,
    )
    rgb, dens = _activate(raw, mlp)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dens), np.asarray(dens_ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_mip_forward_prod_arch():
    mlp, params, weights, means, covs, views, cfg = _setup(
        net_depth=8, width=64, skip=4, max_deg=16, deg_view=4, n=64,
    )
    rgb_ref, dens_ref, _ = mlp.apply(params, None, (means, covs), views)
    raw = fused_mip.fused_mip_mlp_train(
        weights, means, covs, views, cfg["net_depth"], cfg["skip_layer"],
        cfg["num_freqs"], cfg["deg_view"], 32, True,
    )
    rgb, dens = _activate(raw, mlp)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(dens), np.asarray(dens_ref),
                               atol=5e-5, rtol=5e-5)


def test_fused_mip_normals_match_flax():
    """fused_mip_mlp_normals_T rows 4:7 -> normals == the flax MipMLP's
    per-point value_and_grad normals (models/mlp.py:128-148)."""
    mlp, params, weights, means, covs, views, cfg = _setup()
    mlp_n = MipMLP(
        net_depth=4, net_width=32, skip_layer=2, max_deg_point=6,
        deg_view=2, disable_normals=False,
    )
    rgb_ref, dens_ref, normals_ref = mlp_n.apply(
        params, None, (means, covs), views
    )
    out = fused_mip.fused_mip_mlp_normals_T(
        weights, means.T, covs.T, views.T, cfg["net_depth"],
        cfg["skip_layer"], cfg["num_freqs"], cfg["deg_view"], 32, True,
    )
    rgb, dens = _activate(out[:4].T, mlp)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dens), np.asarray(dens_ref),
                               atol=2e-5, rtol=2e-5)
    g = out[4:7] * jax.nn.sigmoid(out[3] + mlp.density_bias)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(g * g, axis=0, keepdims=True),
                                jnp.finfo(jnp.float32).eps))
    normals = np.asarray((-g / norm).T)
    np.testing.assert_allclose(normals, np.asarray(normals_ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_mip_render_normals_match_xla():
    """build_render_fn(mipnerf, use_fused_render=True,
    disable_normals=False): the in-kernel normals chain matches the XLA
    render end-to-end (normals rendering included)."""
    from consistentnerf_tpu.configs import Config
    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import MipBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import evaluation
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import render as render_lib

    base = dict(backbone="mipnerf", netdepth=2, netwidth=32,
                mip_num_samples=8, max_deg_point=4, disable_normals=False,
                N_rand=64, white_bkgd=True, use_tensorboard=False,
                render_chunk_size=256)
    scene = synthetic.make_scene(n_views=3, H=16, W=16).to_scene_data()
    cfg_x = Config(**base)
    cfg_f = Config(**base, use_fused_render=True, fused_tile=256)
    model = make_model(cfg_x)
    batch = MipBatcher(scene, cfg_x).next_batch()
    state = loop_lib.init_state(cfg_x, model, batch)
    rays = evaluation.camera_rays_for_view(scene, scene.poses[0])
    out_x = render_lib.build_render_fn(model, cfg_x, state.params)(rays)
    out_f = render_lib.build_render_fn(model, cfg_f, state.params)(rays)
    assert "normals" in out_x and "normals" in out_f
    for k in ("rgb", "depth", "acc", "normals"):
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_x[k]), atol=5e-4,
            rtol=5e-4, err_msg=k,
        )


def test_fused_mip_gradients_match_jax_grad():
    mlp, params, weights, means, covs, views, cfg = _setup()
    weights = tuple(weights)

    def loss_fused(ws):
        raw = fused_mip.fused_mip_mlp_train(
            ws, means, covs, views, cfg["net_depth"], cfg["skip_layer"],
            cfg["num_freqs"], cfg["deg_view"], 32, True,
        )
        return jnp.sum(jnp.sin(raw))

    def loss_oracle(ws):
        raw = fused_mip.reference_mip_mlp_apply(
            list(ws), means, covs, views, net_depth=cfg["net_depth"],
            skip_layer=cfg["skip_layer"], num_freqs=cfg["num_freqs"],
            deg_view=cfg["deg_view"],
        )
        return jnp.sum(jnp.sin(raw))

    g_f = jax.grad(loss_fused)(weights)
    g_o = jax.grad(loss_oracle)(weights)
    assert len(g_f) == len(g_o)
    for i, (a, b) in enumerate(zip(g_f, g_o)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b).reshape(np.asarray(a).shape),
            atol=1e-3, rtol=1e-3, err_msg=f"weight {i}",
        )


def test_fused_mip_gradients_vs_flax_grad():
    """End-to-end: grads through the fused kernel == grads through the
    flax MipMLP (after matching activations), depth-8 skip arch."""
    mlp, params, weights, means, covs, views, cfg = _setup(
        net_depth=8, width=32, skip=4, max_deg=8, deg_view=3, n=64,
    )
    weights = tuple(weights)

    def loss_flax(p):
        rgb, dens, _ = mlp.apply(p, None, (means, covs), views)
        return jnp.mean(rgb**2) + jnp.mean(dens**2)

    def loss_fused(ws):
        raw = fused_mip.fused_mip_mlp_train(
            ws, means, covs, views, cfg["net_depth"], cfg["skip_layer"],
            cfg["num_freqs"], cfg["deg_view"], 32, True,
        )
        rgb = jax.nn.sigmoid(raw[:, :3])
        rgb = rgb * (1 + 2 * mlp.rgb_padding) - mlp.rgb_padding
        dens = jax.nn.softplus(raw[:, 3] + mlp.density_bias)
        return jnp.mean(rgb**2) + jnp.mean(dens**2)

    g_flax = jax.grad(loss_flax)(params)
    g_flat = [
        jnp.asarray(w) for w in
        fused_mip.flatten_mip_params(g_flax, cfg["net_depth"])
    ]
    g_fused = jax.grad(loss_fused)(weights)
    for i, (a, b) in enumerate(zip(g_fused, g_flat)):
        denom = np.abs(np.asarray(b)).max() + 1e-8
        err = np.abs(np.asarray(a).reshape(np.asarray(b).shape)
                     - np.asarray(b)).max() / denom
        assert err < 2e-3, f"weight {i}: rel err {err}"


def test_fused_mip_bf16_close_to_fp32():
    mlp, params, weights, means, covs, views, cfg = _setup(
        net_depth=8, width=64, skip=4, max_deg=16, deg_view=4, n=64,
    )

    def run(cd):
        return fused_mip.fused_mip_mlp_train(
            weights, means, covs, views, cfg["net_depth"],
            cfg["skip_layer"], cfg["num_freqs"], cfg["deg_view"], 32,
            True, cd,
        )

    o32 = np.asarray(run(jnp.float32))
    o16 = np.asarray(run(jnp.bfloat16))
    scale = np.abs(o32).mean() + 1e-3
    assert np.abs(o16 - o32).max() / scale < 0.15


def test_fused_mip_transposed_forward_and_grads():
    """fused_mip_mlp_train_T ([3,N]/[4,N] streams) == flax oracle +
    jax.grad of the row-major fused op."""
    mlp, params, weights, means, covs, views, cfg = _setup()
    rgb_ref, dens_ref, _ = mlp.apply(params, None, (means, covs), views)
    raw_T = fused_mip.fused_mip_mlp_train_T(
        weights, means.T, covs.T, views.T, cfg["net_depth"],
        cfg["skip_layer"], cfg["num_freqs"], cfg["deg_view"], 32, True,
    )
    rgb, dens = _activate(raw_T.T, mlp)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dens), np.asarray(dens_ref),
                               atol=2e-5, rtol=2e-5)

    def loss_t(ws):
        out = fused_mip.fused_mip_mlp_train_T(
            ws, means.T, covs.T, views.T, cfg["net_depth"],
            cfg["skip_layer"], cfg["num_freqs"], cfg["deg_view"], 32,
            True,
        )
        return jnp.sum(jnp.sin(out))

    def loss_row(ws):
        out = fused_mip.fused_mip_mlp_train(
            ws, means, covs, views, cfg["net_depth"], cfg["skip_layer"],
            cfg["num_freqs"], cfg["deg_view"], 32, True,
        )
        return jnp.sum(jnp.sin(out))

    g_t = jax.grad(loss_t)(tuple(weights))
    g_r = jax.grad(loss_row)(tuple(weights))
    for i, (a, b) in enumerate(zip(g_t, g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
            err_msg=f"weight {i}",
        )


def test_transposed_cast_rays_matches_row_major():
    """cast_rays(transposed=True) == transpose(cast_rays(...))."""
    from consistentnerf_tpu.core import mip as mip_core

    key = jax.random.PRNGKey(7)
    n, s = 11, 6
    origins = jax.random.normal(key, (n, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    radii = jax.random.uniform(jax.random.fold_in(key, 2), (n, 1)) * 0.01
    t_vals = jnp.sort(
        jax.random.uniform(jax.random.fold_in(key, 3), (n, s + 1)) * 3
        + 1, axis=-1,
    )
    for shape in ("cone", "cylinder"):
        m, c = mip_core.cast_rays(t_vals, origins, dirs, radii, shape)
        m_T, c_T = mip_core.cast_rays(t_vals, origins, dirs, radii, shape,
                                      transposed=True)
        np.testing.assert_allclose(
            np.asarray(m_T), np.asarray(jnp.transpose(m, (2, 0, 1))),
            atol=1e-6, rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(c_T), np.asarray(jnp.transpose(c, (2, 0, 1))),
            atol=1e-6, rtol=1e-6,
        )
