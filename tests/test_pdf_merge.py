"""Tests for the fused inverse-CDF + merge kernel (ops/pdf_merge.py)
against the composed reference chain `sort(concat(z_c, sample_pdf(...)))`
(run_nerf_view.py:512-529 semantics via core.sampling.sample_pdf)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.core import sampling
from consistentnerf_tpu.ops import pdf_merge


def _reference(z_c, w, u, return_samples=False):
    z_mid = 0.5 * (z_c[:, 1:] + z_c[:, :-1])
    z_samples = sampling.sample_pdf(z_mid, w, u.shape[-1], u=u)
    merged = jnp.sort(jnp.concatenate([z_c, z_samples], -1), -1)
    return (merged, z_samples) if return_samples else merged


def _random_problem(key, n, s_c, near=2.0, far=6.0, degenerate=False):
    k1, k2 = jax.random.split(key)
    t = jnp.linspace(0.0, 1.0, s_c)
    z = near * (1 - t) + far * t
    jit = jax.random.uniform(k1, (n, s_c)) * (far - near) / s_c * 0.9
    z_c = jnp.sort(z[None] + jit, -1)
    if degenerate:
        w = jnp.zeros((n, s_c - 2))
    else:
        w = jax.random.uniform(k2, (n, s_c - 2)) ** 2
    return z_c, w


@pytest.mark.parametrize("n,s_c,s_i", [(64, 64, 128), (40, 32, 64),
                                       (8, 16, 8)])
def test_det_matches_reference(n, s_c, s_i):
    z_c, w = _random_problem(jax.random.PRNGKey(0), n, s_c)
    u = pdf_merge.fine_z_draws(None, n, s_i, det=True)
    got, got_s = pdf_merge.sample_pdf_merged(z_c, w, u, interpret=True)
    want = _reference(z_c, w, u)
    # atol covers fp tie-breaking: the kernel's log-roll prefix sum and
    # XLA's cumsum round differently, so a draw within ~1 ulp of a cdf
    # entry can flip to the adjacent interval (error bounded by one
    # interpolation step, observed 1/3840 elements at 2.8e-4).
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=1e-5)


def test_sorted_random_draws_match_reference():
    n, s_c, s_i = 96, 64, 128
    z_c, w = _random_problem(jax.random.PRNGKey(1), n, s_c)
    u = pdf_merge.fine_z_draws(jax.random.PRNGKey(2), n, s_i, det=False)
    assert bool(jnp.all(jnp.diff(u, axis=-1) >= 0)), "draws must ascend"
    got, got_s = pdf_merge.sample_pdf_merged(z_c, w, u, interpret=True)
    want, want_s = _reference(z_c, w, u, return_samples=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # the second output is the raw importance-sample vector (feeds z_std)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=1e-5, rtol=1e-5)


def test_degenerate_weights_all_zero():
    """All-zero weights hit the +1e-5 floor: uniform pdf, finite output."""
    n, s_c, s_i = 32, 64, 128
    z_c, w = _random_problem(jax.random.PRNGKey(3), n, s_c,
                             degenerate=True)
    u = pdf_merge.fine_z_draws(None, n, s_i, det=True)
    got, got_s = pdf_merge.sample_pdf_merged(z_c, w, u, interpret=True)
    want = _reference(z_c, w, u)
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_ragged_rows_pad():
    """n not a multiple of the row block: padded rows must not leak."""
    n, s_c, s_i = 37, 64, 128
    z_c, w = _random_problem(jax.random.PRNGKey(4), n, s_c)
    u = pdf_merge.fine_z_draws(jax.random.PRNGKey(5), n, s_i, det=False)
    got, _ = pdf_merge.sample_pdf_merged(z_c, w, u, interpret=True,
                                         block_rows=16)
    want = _reference(z_c, w, u)
    assert got.shape == (n, s_c + s_i)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_output_sorted_and_supersets_coarse():
    n, s_c, s_i = 48, 64, 128
    z_c, w = _random_problem(jax.random.PRNGKey(6), n, s_c)
    u = pdf_merge.fine_z_draws(jax.random.PRNGKey(7), n, s_i, det=False)
    got = np.asarray(
        pdf_merge.sample_pdf_merged(z_c, w, u, interpret=True)[0]
    )
    assert np.all(np.diff(got, axis=-1) >= 0)
    # every coarse z must appear in the merged vector
    for r in (0, n // 2, n - 1):
        for z in np.asarray(z_c)[r]:
            assert np.any(np.isclose(got[r], z, atol=1e-6))


def _mip_reference(rng, t_vals, weights, resample_padding, single_jitter):
    """XLA chain: blurpool + sorted_piecewise_constant_pdf (the
    resample_along_rays body minus cast_rays)."""
    wp = jnp.concatenate(
        [weights[..., :1], weights, weights[..., -1:]], -1
    )
    wm = jnp.maximum(wp[..., :-1], wp[..., 1:])
    blur = 0.5 * (wm[..., :-1] + wm[..., 1:])
    return sampling.sorted_piecewise_constant_pdf(
        rng, t_vals, blur + resample_padding, t_vals.shape[-1],
        single_jitter=single_jitter,
    )


@pytest.mark.parametrize("s,pad", [(16, 0.01), (32, 0.0)])
def test_mip_resample_det_matches_reference(s, pad):
    n = 48
    key = jax.random.PRNGKey(10)
    t = jnp.sort(jax.random.uniform(key, (n, s + 1)) * 4 + 2, -1)
    w = jax.random.uniform(jax.random.PRNGKey(11), (n, s)) ** 2
    eps = jnp.finfo("float32").eps
    u = jnp.broadcast_to(jnp.linspace(0.0, 1.0 - eps, s + 1), (n, s + 1))
    got = pdf_merge.mip_resample_t_vals(t, w, u, pad, interpret=True)
    want = _mip_reference(None, t, w, pad, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=1e-5)


@pytest.mark.parametrize("single_jitter", [False, True])
def test_mip_resample_random_matches_reference(single_jitter):
    """The stochastic draw stream is ascending by construction, so the
    kernel consumes the IDENTICAL u vector the XLA sampler generates."""
    n, s, pad = 40, 16, 0.005
    t = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(12), (n, s + 1)) * 4 + 2, -1
    )
    w = jax.random.uniform(jax.random.PRNGKey(13), (n, s)) ** 2
    rng = jax.random.PRNGKey(14)
    eps = jnp.finfo("float32").eps
    s_ = 1 / (s + 1)
    d = 1 if single_jitter else s + 1
    u = jnp.arange(s + 1) * s_ + jax.random.uniform(
        rng, (n, d), maxval=s_ - eps
    )
    u = jnp.broadcast_to(jnp.minimum(u, 1.0 - eps), (n, s + 1))
    got = pdf_merge.mip_resample_t_vals(t, w, u, pad, interpret=True)
    want = _mip_reference(rng, t, w, pad, single_jitter)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=1e-5)


def test_mip_resample_degenerate_weights():
    """Zero weights + zero padding exercise the eps-deficit pad."""
    n, s = 16, 16
    t = jnp.broadcast_to(jnp.linspace(2.0, 6.0, s + 1), (n, s + 1))
    w = jnp.zeros((n, s))
    eps = jnp.finfo("float32").eps
    u = jnp.broadcast_to(jnp.linspace(0.0, 1.0 - eps, s + 1), (n, s + 1))
    got = pdf_merge.mip_resample_t_vals(t, w, u, 0.0, interpret=True)
    want = _mip_reference(None, t, w, 0.0, False)
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=1e-5)


def test_resample_along_rays_kernel_routing():
    """resample_along_rays(use_kernel=True) must match the XLA path for
    identical rng (same draw stream) at stop_grad=True."""
    n, s = 24, 16
    key = jax.random.PRNGKey(20)
    o = jax.random.normal(key, (n, 3))
    d = jax.random.normal(jax.random.PRNGKey(21), (n, 3))
    radii = jnp.full((n, 1), 1e-3)
    t = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(22), (n, s + 1)) * 4 + 2, -1
    )
    w = jax.random.uniform(jax.random.PRNGKey(23), (n, s)) ** 2
    rng = jax.random.PRNGKey(24)
    args = (o, d, radii, t, w, "cone", True, 0.01, False)
    t_x, (m_x, c_x) = sampling.resample_along_rays(rng, *args)
    t_k, (m_k, c_k) = sampling.resample_along_rays(
        rng, *args, use_kernel=True
    )
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_x),
                               atol=5e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_x),
                               atol=5e-3, rtol=1e-4)


def test_sorted_uniform_distribution():
    """Order-statistics generator: ascending, uniform marginals."""
    u = pdf_merge.sorted_uniform(jax.random.PRNGKey(8), (2000, 16))
    u = np.asarray(u)
    assert np.all(np.diff(u, axis=-1) >= 0)
    assert np.all((u >= 0) & (u <= 1))
    # pooled values of sorted iid uniforms are marginally U[0,1]
    flat = u.reshape(-1)
    hist, _ = np.histogram(flat, bins=10, range=(0, 1))
    assert hist.min() > 0.8 * flat.size / 10
    assert hist.max() < 1.2 * flat.size / 10
