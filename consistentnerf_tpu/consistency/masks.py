"""Mask-weighted reconstruction losses and mask variants.

Reproduces the loss lambdas and mask options of
`nerf-pytorch-master/run_nerf_view.py:35-58,80-100,1117-1159,1645-1666`.
All losses are static-shaped: boolean fancy indexing becomes weighted sums
so they fuse under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse_to_psnr(mse):
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def masked_mse(pred, target, mask):
    """Mean squared error over elements where mask==1 (0 if mask empty).

    Equivalent of `img2mse(rgb[mask == 1], target[mask == 1])` with static
    shapes. `mask` broadcasts against pred's leading dims.
    """
    mask = mask.reshape(mask.shape + (1,) * (pred.ndim - mask.ndim))
    se = (pred - target) ** 2 * mask
    denom = jnp.sum(jnp.broadcast_to(mask, pred.shape))
    return jnp.where(denom > 0, jnp.sum(se) / jnp.maximum(denom, 1), 0.0)


def hardmask_rgb_loss(pred, target, mask, hardmask_coef: float):
    """ConsistentNeRF hard-mask RGB loss (run_nerf_view.py:1645-1648).

    loss = mse(masked) + coef * mse(unmasked), with the second term present
    only when some rays are unmasked (the reference's `if sum != N_rand`).
    """
    n = mask.shape[0]
    in_term = masked_mse(pred, target, mask)
    out_term = masked_mse(pred, target, 1.0 - mask)
    all_masked = jnp.sum(mask) == n
    return in_term + jnp.where(all_masked, 0.0, hardmask_coef * out_term)


def hardmask_depth_loss(pred_depth, prior_depth, mask, far: float):
    """Masked depth MSE, normalized by far (run_nerf_view.py:1737)."""
    return masked_mse(pred_depth / far, prior_depth / far, mask)


def unmasked_depth_loss(pred_depth, prior_depth, mask, normalize_far=None):
    """The non-hardmask depth branch (run_nerf_view.py:1762-1771):
    prior depth zeroed where unmasked, then plain MSE (optionally /far)."""
    prior = jnp.where(mask > 0, prior_depth, 0.0)
    if normalize_far is not None:
        return img2mse(pred_depth / normalize_far, prior / normalize_far)
    return img2mse(pred_depth, prior)


def img2mse_softmask(x, y, temp):
    """Soft-mask reweighted MSE (run_nerf_view.py:50)."""
    se = (x - y) ** 2
    num = jnp.sum(jnp.exp(se / temp) * se)
    den = jnp.sum(jnp.exp(jax.lax.stop_gradient(x - y) ** 2 / temp))
    return num / den


def img2mse_softLpmask(x, y, coef):
    """Lp-soft-mask reweighted MSE (run_nerf_view.py:58)."""
    w = jnp.abs(x - y) ** coef + 1
    return jnp.sum(w * (x - y) ** 2) / jax.lax.stop_gradient(jnp.sum(w))


def temp_schedule(step, total_steps, base_temp, temp_min):
    """Linear temperature decay (Temp_Scheduler, run_nerf_view.py:80-100)."""
    t = (1 - step / total_steps) * (base_temp - temp_min) + temp_min
    return jnp.maximum(t, temp_min)


# --- host-side edge-detection mask variants (run_nerf_view.py:1117-1159) ----


def canny_masks(images: np.ndarray, i_train, threshold1=1, threshold2=200):
    """Canny edge masks for train views; zeros elsewhere. images: [N,H,W,3]."""
    import cv2

    n, h, w = images.shape[:3]
    out = np.zeros((n, h, w), bool)
    for idx in np.asarray(i_train):
        gray = cv2.cvtColor(images[idx].astype(np.float32), cv2.COLOR_BGR2GRAY)
        blur = cv2.GaussianBlur(gray, (3, 3), 0)
        edges = cv2.Canny((blur * 255).astype(np.uint8), threshold1, threshold2)
        out[idx] = edges > 0
    return out


def sobel_masks(images: np.ndarray, i_train, ksize=5):
    """Sobel edge masks for train views; zeros elsewhere."""
    import cv2

    n, h, w = images.shape[:3]
    out = np.zeros((n, h, w), bool)
    for idx in np.asarray(i_train):
        gray = cv2.cvtColor(images[idx].astype(np.float32), cv2.COLOR_BGR2GRAY)
        blur = cv2.GaussianBlur(gray, (3, 3), 0)
        edges = cv2.Sobel(
            src=(blur * 255).astype(np.uint8), ddepth=cv2.CV_64F,
            dx=1, dy=1, ksize=ksize,
        )
        out[idx] = edges != 0
    return out
