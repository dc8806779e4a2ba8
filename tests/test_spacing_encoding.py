"""Tests for spacing curves and positional encodings."""

import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.core import encoding, spacing


def test_genspace_linear_is_linspace():
    got = spacing.genspace(2.0, 6.0, 9)
    np.testing.assert_allclose(got, np.linspace(2.0, 6.0, 9), atol=1e-6)


def test_genspace_log_is_geomspace():
    got = spacing.genspace(1.0, 256.0, 9, fn="log")
    np.testing.assert_allclose(got, np.geomspace(1.0, 256.0, 9), rtol=1e-5)


def test_genspace_reciprocal_is_lindisp():
    near, far = 2.0, 6.0
    got = spacing.genspace(near, far, 5, fn="reciprocal")
    t = np.linspace(0, 1, 5)
    expected = 1.0 / (1.0 / near * (1 - t) + 1.0 / far * t)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_genspace_broadcasts_over_rays():
    near = jnp.array([[1.0], [2.0]])
    far = jnp.array([[5.0], [6.0]])
    got = spacing.genspace(near, far, 4)
    assert got.shape == (2, 4)
    np.testing.assert_allclose(got[0], np.linspace(1, 5, 4), atol=1e-6)
    np.testing.assert_allclose(got[1], np.linspace(2, 6, 4), atol=1e-6)


def test_genspace_jnp_handles_accepted():
    got = spacing.genspace(1.0, 8.0, 4, fn=jnp.log)
    np.testing.assert_allclose(got, np.geomspace(1.0, 8.0, 4), rtol=1e-5)


def test_stratify_midpoint_bounds():
    t_vals = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 8), (4, 8))
    t_rand = jnp.full((4, 8), 0.5)
    out = np.asarray(spacing.stratify(t_vals, t_rand))
    assert np.all(out >= 0) and np.all(out <= 1)
    assert np.all(np.diff(out, axis=-1) >= 0)


def test_posenc_nerf_matches_torch_embedder_ordering():
    """Feature ordering must match run_nerf_helpers.Embedder exactly."""
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(7, 3).astype(np.float32)
    L = 4

    # torch-style oracle: [x] + per-freq [sin, cos] blocks.
    xt = torch.tensor(x)
    feats = [xt]
    freqs = 2.0 ** torch.linspace(0.0, L - 1, steps=L)
    for f in freqs:
        for fn in [torch.sin, torch.cos]:
            feats.append(fn(xt * f))
    expected = torch.cat(feats, -1).numpy()

    got = np.asarray(encoding.posenc_nerf(jnp.array(x), num_freqs=L))
    assert got.shape == (7, 3 * (1 + 2 * L))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_pos_enc_mip_ordering():
    x = np.random.RandomState(1).randn(5, 3).astype(np.float32)
    min_deg, max_deg = 0, 4
    scales = np.array([2**i for i in range(min_deg, max_deg)], np.float32)
    xb = (x[:, None, :] * scales[:, None]).reshape(5, -1)
    expected = np.concatenate(
        [x, np.sin(np.concatenate([xb, xb + 0.5 * np.pi], -1))], -1
    )
    got = np.asarray(encoding.pos_enc(jnp.array(x), min_deg, max_deg))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_expected_sin_zero_variance_is_sin():
    x = jnp.linspace(-3, 3, 11)
    np.testing.assert_allclose(
        encoding.expected_sin(x, jnp.zeros_like(x)), jnp.sin(x), atol=1e-6
    )


def test_expected_sin_large_variance_shrinks():
    x = jnp.array([1.0])
    big = float(encoding.expected_sin(x, jnp.array([10.0]))[0])
    assert abs(big) < 0.01


def test_ipe_zero_cov_equals_pe():
    """With zero covariance the IPE reduces to plain (mip-ordered) sin PE."""
    x = np.random.RandomState(2).randn(6, 3).astype(np.float32)
    covs = np.zeros_like(x)
    got = np.asarray(
        encoding.integrated_pos_enc((jnp.array(x), jnp.array(covs)), 0, 4)
    )
    expected = np.asarray(
        encoding.pos_enc(jnp.array(x), 0, 4, append_identity=False)
    )
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_ipe_diag_matches_full_cov():
    x = np.random.RandomState(3).randn(4, 3).astype(np.float32)
    diag = np.abs(np.random.RandomState(4).randn(4, 3)).astype(np.float32)
    full = np.stack([np.diag(d) for d in diag], 0)
    got_diag = np.asarray(
        encoding.integrated_pos_enc((jnp.array(x), jnp.array(diag)), 0, 3,
                                    diag=True)
    )
    got_full = np.asarray(
        encoding.integrated_pos_enc((jnp.array(x), jnp.array(full)), 0, 3,
                                    diag=False)
    )
    np.testing.assert_allclose(got_diag, got_full, atol=1e-4)
