"""SSIM/MS-SSIM/LPIPS sanity and oracle tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.train import image_metrics, lpips as lpips_mod


def test_ssim_identical_is_one():
    img = jnp.array(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(image_metrics.ssim(img, img)), 1.0, atol=1e-5
    )


def test_ssim_decreases_with_noise():
    rng = np.random.RandomState(1)
    img = jnp.array(rng.rand(1, 32, 32, 3), jnp.float32)
    small = img + 0.01 * rng.randn(1, 32, 32, 3).astype(np.float32)
    big = img + 0.2 * rng.randn(1, 32, 32, 3).astype(np.float32)
    s_small = float(image_metrics.ssim(jnp.clip(small, 0, 1), img)[0])
    s_big = float(image_metrics.ssim(jnp.clip(big, 0, 1), img)[0])
    assert s_small > s_big
    assert 0 < s_big < s_small <= 1.0


def test_ssim_matches_pytorch_msssim_formula():
    """Cross-check against an independent torch implementation of SSIM with
    the same gaussian window."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    a = rng.rand(1, 24, 24, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(1, 24, 24, 3), 0, 1).astype(np.float32)

    # torch oracle: valid-mode separable gaussian SSIM
    at = torch.tensor(a).permute(0, 3, 1, 2)
    bt = torch.tensor(b).permute(0, 3, 1, 2)
    x = torch.arange(11, dtype=torch.float32) - 5
    g = torch.exp(-(x**2) / (2 * 1.5**2))
    g = (g / g.sum()).reshape(1, 1, 1, 11)

    def blur(img):
        c = img.shape[1]
        img = F.conv2d(img, g.expand(c, 1, 1, 11), groups=c)
        img = F.conv2d(img, g.transpose(2, 3).expand(c, 1, 11, 1), groups=c)
        return img

    mu0, mu1 = blur(at), blur(bt)
    s00 = blur(at * at) - mu0 * mu0
    s11 = blur(bt * bt) - mu1 * mu1
    s01 = blur(at * bt) - mu0 * mu1
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) / (
        (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
    )
    expected = float(smap.mean())

    got = float(image_metrics.ssim(jnp.array(a), jnp.array(b))[0])
    assert got == pytest.approx(expected, abs=1e-4)


def test_ms_ssim_identical_is_one():
    img = jnp.array(np.random.RandomState(3).rand(1, 180, 180, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(image_metrics.ms_ssim(img, img)), 1.0, atol=1e-4
    )


def test_masked_psnr():
    rng = np.random.RandomState(4)
    a = jnp.array(rng.rand(16, 16, 3), jnp.float32)
    b = jnp.array(rng.rand(16, 16, 3), jnp.float32)
    m = jnp.ones((16, 16))
    full = float(image_metrics.masked_psnr(a, b, m))
    plain = float(image_metrics.psnr(a, b))
    assert full == pytest.approx(plain, abs=1e-4)


def test_lpips_zero_for_identical_and_positive_otherwise():
    lp = lpips_mod.LPIPS(weights_path=None)
    rng = np.random.RandomState(5)
    img = jnp.array(rng.rand(1, 32, 32, 3), jnp.float32)
    other = jnp.array(rng.rand(1, 32, 32, 3), jnp.float32)
    assert float(lp(img, img)[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(lp(img, other)[0]) > 0
    assert not lp.is_calibrated
