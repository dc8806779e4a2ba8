"""Tests for inverse-CDF samplers and mip resampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.core import sampling


def test_sample_pdf_matches_torch_semantics():
    """Same fixed u -> identical samples as the torch reference algorithm."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    B, M, S = 5, 9, 7
    bins = np.sort(rng.rand(B, M).astype(np.float32) * 4 + 1, axis=-1)
    weights = rng.rand(B, M - 1).astype(np.float32)
    u = rng.rand(B, S).astype(np.float32)

    # torch oracle (independent impl of run_nerf_helpers.sample_pdf semantics)
    wt = torch.tensor(weights) + 1e-5
    pdf = wt / wt.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    ut = torch.tensor(u).contiguous()
    inds = torch.searchsorted(cdf, ut, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    inds_g = torch.stack([below, above], -1)
    matched = [inds_g.shape[0], inds_g.shape[1], cdf.shape[-1]]
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(matched), 2, inds_g)
    bins_g = torch.gather(
        torch.tensor(bins).unsqueeze(1).expand(matched), 2, inds_g
    )
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (ut - cdf_g[..., 0]) / denom
    expected = (bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])).numpy()

    got = np.asarray(
        sampling.sample_pdf(jnp.array(bins), jnp.array(weights), S,
                            u=jnp.array(u))
    )
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_sample_pdf_det_uniform_weights():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (3, 11))
    weights = jnp.ones((3, 10))
    got = np.asarray(sampling.sample_pdf(bins, weights, 5, det=True))
    expected = np.broadcast_to(np.linspace(0, 1, 5), (3, 5))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_sorted_pdf_concentrates_samples():
    """Most samples land in the bin carrying all the weight."""
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (2, 11))
    weights = jnp.zeros((2, 10)).at[:, 5].set(1.0)
    out = np.asarray(
        sampling.sorted_piecewise_constant_pdf(None, bins, weights, 16)
    )
    assert np.all(out >= 0.5 - 1e-4) and np.all(out <= 0.6 + 1e-4)


def test_sorted_pdf_zero_weights_no_nan():
    bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 9), (3, 9))
    weights = jnp.zeros((3, 8))
    out = np.asarray(
        sampling.sorted_piecewise_constant_pdf(
            jax.random.PRNGKey(0), bins, weights, 8
        )
    )
    assert np.all(np.isfinite(out))
    assert np.all(out >= 2.0) and np.all(out <= 6.0)


def test_sorted_pdf_outputs_sorted():
    rng = np.random.RandomState(1)
    bins = np.sort(rng.rand(4, 12).astype(np.float32), -1)
    weights = rng.rand(4, 11).astype(np.float32)
    out = np.asarray(
        sampling.sorted_piecewise_constant_pdf(
            jax.random.PRNGKey(1), jnp.array(bins), jnp.array(weights), 12
        )
    )
    assert np.all(np.diff(out, axis=-1) >= -1e-6)


def test_vanilla_z_vals_linear_and_lindisp():
    near = jnp.full((4, 1), 2.0)
    far = jnp.full((4, 1), 6.0)
    z = np.asarray(sampling.vanilla_z_vals(near, far, 5, False, None))
    np.testing.assert_allclose(z[0], np.linspace(2, 6, 5), atol=1e-5)
    z = np.asarray(sampling.vanilla_z_vals(near, far, 5, True, None))
    t = np.linspace(0, 1, 5)
    np.testing.assert_allclose(
        z[0], 1.0 / (1.0 / 2 * (1 - t) + 1.0 / 6 * t), rtol=1e-5
    )


def test_sample_along_rays_deterministic_fenceposts():
    B = 6
    origins = jnp.zeros((B, 3))
    directions = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (B, 1))
    radii = jnp.full((B, 1), 1e-3)
    near = jnp.full((B, 1), 2.0)
    far = jnp.full((B, 1), 6.0)
    t_vals, (means, covs) = sampling.sample_along_rays(
        None, origins, directions, radii, 8, near, far, None, "cone", False
    )
    assert t_vals.shape == (B, 9)
    assert means.shape == (B, 8, 3)
    assert covs.shape == (B, 8, 3)
    np.testing.assert_allclose(np.asarray(t_vals)[0], np.linspace(2, 6, 9),
                               atol=1e-5)
    # means z roughly at the interval midpoints (cone correction is small).
    mids = 0.5 * (np.linspace(2, 6, 9)[:-1] + np.linspace(2, 6, 9)[1:])
    np.testing.assert_allclose(-np.asarray(means)[0, :, 2], mids, rtol=1e-2)


def test_resample_along_rays_runs_and_sorted():
    B, S = 4, 8
    origins = jnp.zeros((B, 3))
    directions = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (B, 1))
    radii = jnp.full((B, 1), 1e-3)
    t_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S + 1), (B, S + 1))
    weights = jax.random.uniform(jax.random.PRNGKey(0), (B, S))
    new_t, (means, covs) = sampling.resample_along_rays(
        jax.random.PRNGKey(1), origins, directions, radii, t_vals, weights,
        "cone", True, 0.01, False,
    )
    assert new_t.shape == (B, S + 1)
    assert np.all(np.diff(np.asarray(new_t), axis=-1) >= -1e-6)
