"""Golden/property tests for core math utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.core import mathx


def test_mse_psnr_roundtrip():
    mse = jnp.array([1e-4, 1e-2, 0.5])
    psnr = mathx.mse_to_psnr(mse)
    np.testing.assert_allclose(mathx.psnr_to_mse(psnr), mse, rtol=1e-4)


def test_psnr_golden():
    # PSNR of MSE=0.01 is exactly 20 dB.
    assert np.isclose(float(mathx.mse_to_psnr(jnp.array(0.01))), 20.0, atol=1e-4)


def test_safe_trig_matches_plain_for_small_args():
    x = jnp.linspace(-10, 10, 101)
    np.testing.assert_allclose(mathx.safe_sin(x), jnp.sin(x), atol=1e-6)
    np.testing.assert_allclose(mathx.safe_cos(x), jnp.cos(x), atol=1e-6)


def test_safe_trig_finite_for_huge_args():
    x = jnp.array([1e10, -1e12, 1e20])
    assert np.all(np.isfinite(mathx.safe_sin(x)))
    assert np.all(np.isfinite(mathx.safe_cos(x)))


def test_weighted_percentile_uniform_weights():
    x = jnp.arange(1.0, 101.0)
    w = jnp.ones_like(x)
    # Median of 1..100 with cumulative-weight interp lands near 50.
    med = mathx.weighted_percentile(x, w, [50])
    assert 49.0 <= float(med[0]) <= 51.0


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(
        mathx.srgb_to_linear(mathx.linear_to_srgb(x)), x, atol=1e-5
    )


def test_log_lerp_endpoints():
    assert np.isclose(float(mathx.log_lerp(0.0, 2e-3, 2e-5)), 2e-3)
    assert np.isclose(float(mathx.log_lerp(1.0, 2e-3, 2e-5)), 2e-5)
    # midpoint is the geometric mean
    assert np.isclose(
        float(mathx.log_lerp(0.5, 1e-2, 1e-4)), 1e-3, rtol=1e-4
    )


def test_learning_rate_decay_schedule():
    lr0 = float(mathx.learning_rate_decay(0, 2e-3, 2e-5, 100))
    lrN = float(mathx.learning_rate_decay(100, 2e-3, 2e-5, 100))
    assert np.isclose(lr0, 2e-3, rtol=1e-6)
    assert np.isclose(lrN, 2e-5, rtol=1e-6)
    # warmup suppresses the initial lr
    lr_warm = float(
        mathx.learning_rate_decay(0, 2e-3, 2e-5, 100, lr_delay_steps=10,
                                  lr_delay_mult=0.01)
    )
    assert lr_warm < lr0


def test_exp_lr_decay_matches_pytorch_rule():
    # run_nerf_view.py:1989-1993 — lr 5e-4 * 0.1^(step/250k).
    assert np.isclose(mathx.exp_lr_decay(0, 5e-4), 5e-4)
    assert np.isclose(mathx.exp_lr_decay(250_000, 5e-4), 5e-5)


def test_tv_norm_constant_patch_is_zero():
    v = jnp.ones((2, 8, 8))
    assert float(mathx.compute_tv_norm(v).sum()) == 0.0


def test_tv_norm_l2_golden():
    # 1x2x2 patch [[0,1],[2,0]] -> v00=0, v01=1, v10=2 -> (0-1)^2+(0-2)^2 = 5.
    v = jnp.array([[[0.0, 1.0], [2.0, 0.0]]])
    assert np.isclose(float(mathx.compute_tv_norm(v).sum()), 5.0)


def test_tvnorm_weight_anneal():
    assert np.isclose(mathx.compute_tvnorm_weight(0, 512, 400.0, 0.1), 400.0)
    assert np.isclose(mathx.compute_tvnorm_weight(512, 512, 400.0, 0.1), 0.1)
    assert np.isclose(mathx.compute_tvnorm_weight(1024, 512, 400.0, 0.1), 0.1)


def test_census_identical_images_zero():
    img = jnp.array(np.random.RandomState(0).rand(8, 8, 3), jnp.float32)
    assert float(mathx.compute_census_err(img, img, 1 / 255)) == 0.0


def test_avg_error_golden():
    # psnr=20 -> mse=0.01; ssim=0.75 -> dssim=0.5; lpips=0.2.
    expected = np.exp(np.mean(np.log([0.01, 0.5, 0.2])))
    got = float(mathx.compute_avg_error(jnp.array(20.0), jnp.array(0.75),
                                        jnp.array(0.2)))
    assert np.isclose(got, expected, rtol=1e-5)
