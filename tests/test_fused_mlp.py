"""Pallas fused-MLP kernel vs the XLA oracle and the flax module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.core import encoding
from consistentnerf_tpu.models.mlp import NeRFMLP
from consistentnerf_tpu.ops import fused_mlp as fm


@pytest.fixture(scope="module")
def setup():
    mlp = NeRFMLP(net_depth=8, net_width=256, use_viewdirs=True)
    pts_embed = jnp.zeros((4, 63))
    views_embed = jnp.zeros((4, 27))
    params = mlp.init(jax.random.PRNGKey(0), pts_embed, views_embed)
    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (300, 3))
    views = jax.random.normal(jax.random.PRNGKey(2), (300, 3))
    views = views / jnp.linalg.norm(views, axis=-1, keepdims=True)
    return mlp, params, pts, views


def test_oracle_matches_flax_module(setup):
    """reference_mlp_apply (kernel weight layout) == the flax module."""
    mlp, params, pts, views = setup
    pe = encoding.posenc_nerf(pts, 10)
    ve = encoding.posenc_nerf(views, 4)
    expected = mlp.apply(params, pe, ve)
    got = fm.reference_mlp_apply(params, pts, views)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=2e-5)


def test_fused_kernel_matches_oracle_interpret(setup):
    """Pallas kernel (interpret mode on CPU) == XLA oracle, incl. padding."""
    _, params, pts, views = setup
    expected = fm.reference_mlp_apply(params, pts, views)
    got = fm.fused_mlp(params, pts, views, tile=128, interpret=True)
    assert got.shape == (300, 4)  # 300 is not a tile multiple: pad+unpad
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_fused_kernel_small_net_interpret():
    mlp = NeRFMLP(net_depth=2, net_width=32, use_viewdirs=True, skips=(1,))
    pe_dim = 3 * (1 + 2 * 4)
    ve_dim = 3 * (1 + 2 * 2)
    params = mlp.init(
        jax.random.PRNGKey(0), jnp.zeros((2, pe_dim)), jnp.zeros((2, ve_dim))
    )
    pts = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    views = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    expected = fm.reference_mlp_apply(
        params, pts, views, net_depth=2, skips=(1,), multires=4,
        multires_views=2,
    )
    got = fm.fused_mlp(
        params, pts, views, net_depth=2, skips=(1,), multires=4,
        multires_views=2, tile=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("kernel", ["v2", "v2row"])
def test_fused_render_matches_model_apply(kernel):
    """fused_render_rays (interpret kernel) == VanillaNeRF deterministic;
    v2row must select the row-major layout its name implies (ADVICE r2)."""
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
        interpret=True, kernel=kernel,
    )
    for k in ["rgb", "depth", "acc", "rgb0", "depth0"]:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(expected[k]), atol=2e-4,
            rtol=2e-4, err_msg=k,
        )


def test_fused_mip_render_matches_model_apply():
    """build_render_fn(mipnerf, use_fused_render=True) == the XLA render
    path (interpret-mode kernels on CPU, fp32)."""
    import numpy as np

    from consistentnerf_tpu.configs import Config
    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import MipBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import evaluation
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import render as render_lib

    base = dict(backbone="mipnerf", netdepth=2, netwidth=32,
                mip_num_samples=8, max_deg_point=4, disable_normals=True,
                N_rand=0, white_bkgd=True, use_tensorboard=False,
                render_chunk_size=256, dataset_type="blender")
    cfg = Config(**base)
    cfg_fused = Config(**base, use_fused_render=True, fused_tile=64)
    scene = synthetic.make_scene(n_views=4, H=16, W=16).to_scene_data()
    model = make_model(cfg)
    batch = MipBatcher(scene, cfg).next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    rays = evaluation.camera_rays_for_view(scene, scene.poses[0])
    out_x = render_lib.build_render_fn(model, cfg, state.params)(rays)
    out_f = render_lib.build_render_fn(model, cfg_fused,
                                       state.params)(rays)
    for k in ("rgb", "depth", "acc", "distance_median"):
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_x[k]),
            atol=5e-4, rtol=5e-4, err_msg=k,
        )
