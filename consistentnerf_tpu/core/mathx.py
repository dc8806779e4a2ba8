"""Math utilities shared by the rendering core and trainers.

Semantics follow the reference implementations
(`RegNeRF/internal/math.py`, `nerf-pytorch-master/run_nerf_helpers.py`)
but are written TPU-first: fp32 `Precision.HIGHEST` matmuls where accuracy
matters, range-reduced trig (TPU transcendentals NaN for huge args), and
no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision matmul (TPU matmuls default to bf16 accumulate)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def safe_trig_helper(x, fn, t=100 * jnp.pi):
    """Range-reduce x before sin/cos; TPU trig NaNs out for large inputs."""
    return fn(jnp.where(jnp.abs(x) < t, x, x % t))


def safe_cos(x):
    return safe_trig_helper(x, jnp.cos)


def safe_sin(x):
    return safe_trig_helper(x, jnp.sin)


def mse_to_psnr(mse):
    """PSNR assuming max pixel value 1 (cf. RegNeRF/internal/math.py:42)."""
    return -10.0 / jnp.log(10.0) * jnp.log(mse)


def psnr_to_mse(psnr):
    return jnp.exp(-0.1 * jnp.log(10.0) * psnr)


def weighted_percentile(x, w, ps, assume_sorted: bool = False):
    """Weighted percentile(s) of a single vector (RegNeRF math.py:52)."""
    x = x.reshape([-1])
    w = w.reshape([-1])
    if not assume_sorted:
        sortidx = jnp.argsort(jax.lax.stop_gradient(x))
        x, w = x[sortidx], w[sortidx]
    acc_w = jnp.cumsum(w)
    return jnp.interp(jnp.array(ps) * (acc_w[-1] / 100), acc_w, x)


def compute_avg_error(psnr, ssim, lpips):
    """geomean(MSE, sqrt(1-SSIM), LPIPS) — the paper's 'average' error."""
    mse = psnr_to_mse(psnr)
    dssim = jnp.sqrt(1 - ssim)
    return jnp.exp(jnp.mean(jnp.log(jnp.array([mse, dssim, lpips]))))


def compute_ternary_census(im, epsilon, boundary="edge"):
    """Ternary census transform of a single [H, W, C] image (math.py:70)."""
    assert len(im.shape) == 3
    assert epsilon >= 0
    im_pad = jnp.pad(im, [(1, 1), (1, 1), (0, 0)], boundary)
    census = []
    for di in [-1, 0, 1]:
        for dj in [-1, 0, 1]:
            if di == dj == 0:
                continue
            im_rolled = jnp.roll(jnp.roll(im_pad, di, -2), dj, -3)[1:-1, 1:-1, :]
            delta = im - im_rolled
            census.append(
                jnp.where(jnp.abs(delta) <= epsilon, 0, jnp.int8(jnp.sign(delta)))
            )
    return jnp.stack(census, -1)


def compute_census_err(im0, im1, epsilon):
    """Frequency of opposite-signed ternary census transforms (math.py:87)."""
    census0, census1 = [compute_ternary_census(x, epsilon) for x in [im0, im1]]
    return jnp.mean(jnp.abs(census0 - census1) > 1)


def linear_to_srgb(linear):
    eps = jnp.finfo(jnp.float32).eps
    srgb0 = 323 / 25 * linear
    srgb1 = (211 * jnp.maximum(eps, linear) ** (5 / 12) - 11) / 200
    return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb):
    eps = jnp.finfo(jnp.float32).eps
    linear0 = 25 / 323 * srgb
    linear1 = jnp.maximum(eps, ((200 * srgb + 11) / 211)) ** (12 / 5)
    return jnp.where(srgb <= 0.04045, linear0, linear1)


def log_lerp(t, v0, v1):
    """Log-linear interpolation from v0 (t=0) to v1 (t=1)."""
    if v0 <= 0 or v1 <= 0:
        raise ValueError(f"Interpolants {v0} and {v1} must be positive.")
    lv0 = jnp.log(v0)
    lv1 = jnp.log(v1)
    return jnp.exp(jnp.clip(t, 0, 1) * (lv1 - lv0) + lv0)


def learning_rate_decay(
    step, lr_init, lr_final, max_steps, lr_delay_steps=0, lr_delay_mult=1
):
    """Log-linear lr decay with optional sine warmup (RegNeRF math.py:134)."""
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp(step / max_steps, lr_init, lr_final)


def exp_lr_decay(step, lr_init, decay_rate=0.1, decay_steps=250_000):
    """PyTorch-trainer lr schedule: lr * decay^(step/decay_steps)
    (run_nerf_view.py:1989-1993)."""
    return lr_init * (decay_rate ** (step / decay_steps))


def compute_tv_norm(values, losstype="l2", weighting=None):
    """Total-variation norm over patch values [..., H, W] (math.py:237)."""
    v00 = values[:, :-1, :-1]
    v01 = values[:, :-1, 1:]
    v10 = values[:, 1:, :-1]

    if losstype == "l2":
        loss = ((v00 - v01) ** 2) + ((v00 - v10) ** 2)
    elif losstype == "l1":
        loss = jnp.abs(v00 - v01) + jnp.abs(v00 - v10)
    else:
        raise ValueError("Not supported losstype.")

    if weighting is not None:
        loss = loss * weighting
    return loss


def compute_tvnorm_weight(step, max_step, weight_start=0.0, weight_end=0.0):
    """Linearly annealed loss weight for the TV norm (math.py:259).

    jnp-based so it works both host-side and inside a jitted step
    (train/step.py evaluates it from the traced `state.step`).
    """
    w = jnp.clip(step * 1.0 / (1 if (max_step < 1) else max_step), 0, 1)
    return weight_start * (1 - w) + w * weight_end
