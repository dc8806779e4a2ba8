"""Tests for alpha compositing, including a torch cross-check oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.core import rendering


def test_raw2outputs_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    N, S = 6, 10
    raw = rng.randn(N, S, 4).astype(np.float32)
    z_vals = np.sort(rng.rand(N, S).astype(np.float32) * 4 + 2, -1)
    rays_d = rng.randn(N, 3).astype(np.float32)

    # torch oracle implementing run_nerf raw2outputs semantics independently
    rawt = torch.tensor(raw)
    zt = torch.tensor(z_vals)
    dt = torch.tensor(rays_d)
    dists = zt[..., 1:] - zt[..., :-1]
    dists = torch.cat(
        [dists, torch.full_like(dists[..., :1], 1e10)], -1
    ) * torch.norm(dt[..., None, :], dim=-1)
    rgb = torch.sigmoid(rawt[..., :3])
    alpha = 1.0 - torch.exp(-torch.relu(rawt[..., 3]) * dists)
    trans = torch.cumprod(
        torch.cat([torch.ones((N, 1)), 1.0 - alpha + 1e-10], -1), -1
    )[:, :-1]
    weights = alpha * trans
    rgb_map = torch.sum(weights[..., None] * rgb, -2)
    depth_map = torch.sum(weights * zt, -1)
    acc_map = torch.sum(weights, -1)
    disp_map = 1.0 / torch.max(
        1e-10 * torch.ones_like(depth_map), depth_map / acc_map
    )

    got = rendering.raw2outputs(jnp.array(raw), jnp.array(z_vals),
                                jnp.array(rays_d))
    for g, e in zip(got, [rgb_map, disp_map, acc_map, weights, depth_map]):
        np.testing.assert_allclose(np.asarray(g), e.numpy(), rtol=2e-4,
                                   atol=1e-5)


def test_raw2outputs_white_background():
    N, S = 4, 6
    raw = jnp.concatenate(
        [jnp.zeros((N, S, 3)), jnp.full((N, S, 1), -100.0)], -1
    )  # zero density
    z_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (N, S))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (N, 1))
    rgb_map, _, acc, _, _ = rendering.raw2outputs(
        raw, z_vals, rays_d, white_bkgd=True
    )
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb_map), 1.0, atol=1e-6)


def test_opaque_wall_depth():
    """A very dense slab at the 3rd sample puts all weight there."""
    N, S = 2, 8
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (N, S))
    density = jnp.zeros((N, S)).at[:, 3].set(1000.0)
    raw = jnp.concatenate(
        [jnp.zeros((N, S, 3)), density[..., None]], -1
    )
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (N, 1))
    _, _, acc, weights, depth = rendering.raw2outputs(raw, z, rays_d)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), float(z[0, 3]), atol=1e-3)
    assert np.argmax(np.asarray(weights)[0]) == 3


def test_compute_alpha_weights_partition_of_unity():
    """weights sum to 1 - exp(-total optical depth)."""
    N, S = 3, 16
    t_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S + 1), (N, S + 1))
    density = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (N, S)))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (N, 1))
    weights, alpha, trans, delta = rendering.compute_alpha_weights(
        density, t_vals, dirs
    )
    total_od = np.asarray((density * delta).sum(-1))
    np.testing.assert_allclose(
        np.asarray(weights.sum(-1)), 1 - np.exp(-total_od), rtol=1e-4
    )
    assert np.all(np.asarray(trans)[:, 0] == 1.0)


def test_volumetric_rendering_basic_and_extras():
    N, S = 4, 12
    t_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S + 1), (N, S + 1))
    key = jax.random.PRNGKey(1)
    density = jnp.abs(jax.random.normal(key, (N, S))) * 5
    dirs = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (N, 1))
    weights, _, _, delta = rendering.compute_alpha_weights(density, t_vals, dirs)
    rgbs = jax.random.uniform(key, (N, S, 3))
    normals = jnp.zeros((N, S, 3))

    out = rendering.volumetric_rendering(
        rgbs, weights, normals, t_vals, False, 2, True, delta
    )
    assert out["rgb"].shape == (N, 3)
    assert np.all(np.asarray(out["distance_mean"]) >= 2.0 - 1e-5)
    assert np.all(np.asarray(out["distance_mean"]) <= 6.0 + 1e-5)
    assert out["distance_median"].shape == (N,)
    assert out["ray_t_vals"].shape == (2, S + 1)
    assert np.all(np.isfinite(np.asarray(out["distance_std"])))


def test_volumetric_rendering_white_background():
    N, S = 2, 4
    t_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S + 1), (N, S + 1))
    weights = jnp.zeros((N, S))
    rgbs = jnp.zeros((N, S, 3))
    out = rendering.volumetric_rendering(
        rgbs, weights, jnp.zeros((N, S, 3)), t_vals, True, 1, False,
        jnp.ones((N, S)),
    )
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-6)


def test_raw2outputs_T_matches_row_major():
    """raw2outputs_T([4,N,S]) == raw2outputs([N,S,4]) bitwise-close."""
    import jax
    import jax.numpy as jnp

    from consistentnerf_tpu.core import rendering

    key = jax.random.PRNGKey(3)
    n, s = 17, 9
    raw = jax.random.normal(key, (n, s, 4))
    z_vals = jnp.sort(jax.random.uniform(key, (n, s)) * 4 + 2, axis=-1)
    rays_d = jax.random.normal(jax.random.PRNGKey(4), (n, 3))
    for white in (False, True):
        ref = rendering.raw2outputs(raw, z_vals, rays_d, None, white)
        got = rendering.raw2outputs_T(
            jnp.transpose(raw, (2, 0, 1)), z_vals, rays_d, None, white
        )
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6)
