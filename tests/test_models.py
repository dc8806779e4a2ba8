"""Tests for the model layer: shapes, determinism, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.core.rays import Rays
from consistentnerf_tpu.models import MipNeRF, NeRFMLP, VanillaNeRF


def _make_rays(n, near=2.0, far=6.0, seed=0):
    key = jax.random.PRNGKey(seed)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ones = jnp.ones((n, 1))
    return Rays(
        origins=jnp.zeros((n, 3)),
        directions=d,
        viewdirs=d,
        radii=ones * 1e-3,
        lossmult=ones,
        near=ones * near,
        far=ones * far,
    )


def test_nerf_mlp_params_and_shapes():
    mlp = NeRFMLP()
    pts = jnp.zeros((7, 63))
    views = jnp.zeros((7, 27))
    params = mlp.init(jax.random.PRNGKey(0), pts, views)
    out = mlp.apply(params, pts, views)
    assert out.shape == (7, 4)
    p = params["params"]
    # ConsistentNeRF temperature params exist with the reference init values.
    np.testing.assert_allclose(np.asarray(p["temp_rgb"]), -0.7)
    np.testing.assert_allclose(np.asarray(p["temp_depth"]), -0.7)
    np.testing.assert_allclose(np.asarray(p["depth_scale"]), 1.0)
    # Trunk of 8 layers with skip at 4: layer 5 input width is W + input_ch.
    assert p["pts_5"]["kernel"].shape == (256 + 63, 256)
    assert p["pts_0"]["kernel"].shape == (63, 256)
    assert p["views_0"]["kernel"].shape == (256 + 27, 128)


def test_vanilla_nerf_forward_shapes():
    model = VanillaNeRF(num_samples=16, num_importance=8)
    rays = _make_rays(10)
    params = model.init(jax.random.PRNGKey(0), None, rays)
    out = model.apply(params, None, rays)
    assert out["rgb"].shape == (10, 3)
    assert out["rgb0"].shape == (10, 3)
    for k in ["disp", "acc", "depth", "disp0", "acc0", "depth0", "z_std"]:
        assert out[k].shape == (10,), k
    assert np.all(np.isfinite(np.asarray(out["rgb"])))


def test_vanilla_nerf_deterministic_without_rng():
    model = VanillaNeRF(num_samples=16, num_importance=8)
    rays = _make_rays(6)
    params = model.init(jax.random.PRNGKey(0), None, rays)
    out1 = model.apply(params, None, rays)
    out2 = model.apply(params, None, rays)
    np.testing.assert_array_equal(np.asarray(out1["rgb"]),
                                  np.asarray(out2["rgb"]))


def test_vanilla_nerf_coarse_only():
    model = VanillaNeRF(num_samples=16, num_importance=0)
    rays = _make_rays(5)
    params = model.init(jax.random.PRNGKey(0), None, rays)
    out = model.apply(params, None, rays)
    assert "rgb0" not in out
    assert out["rgb"].shape == (5, 3)


def test_vanilla_nerf_grads_flow():
    model = VanillaNeRF(num_samples=8, num_importance=4)
    rays = _make_rays(4)
    params = model.init(jax.random.PRNGKey(0), None, rays)

    def loss_fn(p):
        out = model.apply(p, jax.random.PRNGKey(1), rays)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["rgb0"] ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # both coarse and fine trunks get gradients
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert gnorm > 0


def test_mipnerf_forward_levels_and_extras():
    model = MipNeRF(num_samples=8, num_levels=2, disable_normals=True,
                    vis_num_rays=4)
    rays = _make_rays(9)
    params = model.init(jax.random.PRNGKey(0), None, rays)
    out = model.apply(params, None, rays, 0.01, True)
    assert len(out) == 2
    for level in out:
        assert level["rgb"].shape == (9, 3)
        assert level["distance_mean"].shape == (9,)
        assert "distance_median" in level
        assert np.all(np.isfinite(np.asarray(level["rgb"])))


def test_mipnerf_shared_mlp_param_count():
    """Both levels share one MLP: exactly one MipMLP subtree in params."""
    model = MipNeRF(num_samples=8, disable_normals=True)
    rays = _make_rays(4)
    params = model.init(jax.random.PRNGKey(0), None, rays)
    mlp_keys = [k for k in params["params"].keys() if "MipMLP" in k]
    assert len(mlp_keys) == 1


def test_mipnerf_normals_unit_norm():
    model = MipNeRF(num_samples=4, num_levels=1, disable_normals=False,
                    net_depth=2, net_width=16)
    rays = _make_rays(3)
    params = model.init(jax.random.PRNGKey(0), None, rays)
    out = model.apply(params, None, rays, 0.01, True)
    normals = np.asarray(out[0]["normals"])
    assert normals.shape == (3, 3)
    assert np.all(np.isfinite(normals))


def test_mipnerf_randomized_varies_with_rng():
    model = MipNeRF(num_samples=8, disable_normals=True)
    rays = _make_rays(5)
    params = model.init(jax.random.PRNGKey(0), None, rays)
    o1 = model.apply(params, jax.random.PRNGKey(1), rays)
    o2 = model.apply(params, jax.random.PRNGKey(2), rays)
    assert not np.allclose(np.asarray(o1[-1]["rgb"]), np.asarray(o2[-1]["rgb"]))
