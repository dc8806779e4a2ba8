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
    """Weighted percentile(s) of a single vector.

    Formula provenance: RegNeRF/internal/math.py:52 (interp against the
    cumulative weight)."""
    x = x.reshape([-1])
    w = w.reshape([-1])
    if not assume_sorted:
        order = jnp.argsort(jax.lax.stop_gradient(x))
        x, w = x[order], w[order]
    cum_w = jnp.cumsum(w)
    return jnp.interp(jnp.array(ps) * (cum_w[-1] / 100), cum_w, x)


def compute_avg_error(psnr, ssim, lpips):
    """geomean(MSE, sqrt(1-SSIM), LPIPS) — the paper's 'average' error."""
    mse = psnr_to_mse(psnr)
    dssim = jnp.sqrt(1 - ssim)
    return jnp.exp(jnp.mean(jnp.log(jnp.array([mse, dssim, lpips]))))


def compute_ternary_census(im, epsilon, boundary="edge"):
    """Ternary census transform of a single [H, W, C] image: the sign of
    each pixel's difference to its 8 neighbors, zeroed inside +-epsilon.

    Formula provenance: RegNeRF/internal/math.py:70."""
    assert len(im.shape) == 3
    assert epsilon >= 0
    padded = jnp.pad(im, [(1, 1), (1, 1), (0, 0)], boundary)
    offsets = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)
               if (di, dj) != (0, 0)]
    codes = []
    for di, dj in offsets:
        neighbor = jnp.roll(jnp.roll(padded, di, -2), dj, -3)[1:-1, 1:-1, :]
        diff = im - neighbor
        codes.append(
            jnp.where(jnp.abs(diff) <= epsilon, 0, jnp.int8(jnp.sign(diff)))
        )
    return jnp.stack(codes, -1)


def compute_census_err(im0, im1, epsilon):
    """Rate of opposite-signed census codes between two images.

    Formula provenance: RegNeRF/internal/math.py:87 (|c0 - c1| > 1 means
    the signs disagree, not merely one being zero)."""
    c0 = compute_ternary_census(im0, epsilon)
    c1 = compute_ternary_census(im1, epsilon)
    return jnp.mean(jnp.abs(c0 - c1) > 1)


def linear_to_srgb(linear):
    """IEC 61966-2-1 linear -> sRGB transfer (exact rational constants)."""
    eps = jnp.finfo(jnp.float32).eps
    below = 323 / 25 * linear
    above = (211 * jnp.maximum(eps, linear) ** (5 / 12) - 11) / 200
    return jnp.where(linear <= 0.0031308, below, above)


def srgb_to_linear(srgb):
    """IEC 61966-2-1 sRGB -> linear transfer (exact rational constants)."""
    eps = jnp.finfo(jnp.float32).eps
    below = 25 / 323 * srgb
    above = jnp.maximum(eps, ((200 * srgb + 11) / 211)) ** (12 / 5)
    return jnp.where(srgb <= 0.04045, below, above)


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
    """Log-linear lr decay with an optional quarter-sine warmup ramp.

    Formula provenance: RegNeRF/internal/math.py:134."""
    warmup = 1.0
    if lr_delay_steps > 0:
        ramp = jnp.sin(0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        warmup = lr_delay_mult + (1 - lr_delay_mult) * ramp
    return warmup * log_lerp(step / max_steps, lr_init, lr_final)


def exp_lr_decay(step, lr_init, decay_rate=0.1, decay_steps=250_000):
    """PyTorch-trainer lr schedule: lr * decay^(step/decay_steps)
    (run_nerf_view.py:1989-1993)."""
    return lr_init * (decay_rate ** (step / decay_steps))


def compute_tv_norm(values, losstype="l2", weighting=None):
    """Total-variation norm over patch values [..., H, W]: per-pixel
    horizontal + vertical neighbor differences, L1 or squared.

    Formula provenance: RegNeRF/internal/math.py:237."""
    center = values[:, :-1, :-1]
    dx = center - values[:, :-1, 1:]
    dy = center - values[:, 1:, :-1]

    if losstype == "l2":
        tv = dx**2 + dy**2
    elif losstype == "l1":
        tv = jnp.abs(dx) + jnp.abs(dy)
    else:
        raise ValueError("Not supported losstype.")

    if weighting is not None:
        tv = tv * weighting
    return tv


def compute_tvnorm_weight(step, max_step, weight_start=0.0, weight_end=0.0):
    """Linearly annealed loss weight for the TV norm.

    Formula provenance: RegNeRF/internal/math.py:259. jnp-based so it
    works both host-side and inside a jitted step (train/step.py
    evaluates it from the traced `state.step`).
    """
    frac = jnp.clip(step * 1.0 / (1 if (max_step < 1) else max_step), 0, 1)
    return weight_start * (1 - frac) + frac * weight_end
