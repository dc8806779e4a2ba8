"""Image quality metrics in pure JAX: SSIM, MS-SSIM, masked PSNR.

SSIM follows the standard Wang et al. formulation with an 11x1.5 Gaussian
window and 'valid' padding — the same construction as the reference's
`pytorch_msssim.ssim` (used for the patch loss, run_nerf_view.py:1701) and
`skimage.structural_similarity` (used in RegNeRF eval). Masked PSNR follows
`alky/vis_utils.py:24-43`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / jnp.sum(g)


def _effective_filter_size(filter_size: int, h: int, w: int) -> int:
    """Clamp the window to the image (odd size), so small patches work."""
    k = min(filter_size, h, w)
    return k if k % 2 == 1 else k - 1


def _filter2d_separable(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode separable Gaussian filter on [..., H, W, C] images."""
    k = kernel.shape[0]

    def conv_axis(x, axis):
        # Move the filtered axis last for a 1-D depthwise conv via dot.
        x = jnp.moveaxis(x, axis, -1)
        n = x.shape[-1]
        windows = jnp.stack(
            [x[..., i : n - k + 1 + i] for i in range(k)], axis=-1
        )
        out = jnp.einsum("...wk,k->...w", windows, kernel)
        return jnp.moveaxis(out, -1, axis)

    img = conv_axis(img, -3)  # H
    img = conv_axis(img, -2)  # W
    return img


def ssim(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    return_map: bool = False,
):
    """SSIM of [..., H, W, C] image batches. Returns per-image scalars."""
    filter_size = _effective_filter_size(
        filter_size, img0.shape[-3], img0.shape[-2]
    )
    kernel = _gaussian_kernel(filter_size, filter_sigma)
    mu0 = _filter2d_separable(img0, kernel)
    mu1 = _filter2d_separable(img1, kernel)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    sigma00 = _filter2d_separable(img0**2, kernel) - mu00
    sigma11 = _filter2d_separable(img1**2, kernel) - mu11
    sigma01 = _filter2d_separable(img0 * img1, kernel) - mu01

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    if return_map:
        return ssim_map
    return jnp.mean(ssim_map, axis=(-3, -2, -1))


def _ssim_and_cs(img0, img1, max_val, filter_size, filter_sigma, k1, k2):
    filter_size = _effective_filter_size(
        filter_size, img0.shape[-3], img0.shape[-2]
    )
    kernel = _gaussian_kernel(filter_size, filter_sigma)
    mu0 = _filter2d_separable(img0, kernel)
    mu1 = _filter2d_separable(img1, kernel)
    sigma00 = _filter2d_separable(img0**2, kernel) - mu0**2
    sigma11 = _filter2d_separable(img1**2, kernel) - mu1**2
    sigma01 = _filter2d_separable(img0 * img1, kernel) - mu0 * mu1
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    cs_map = (2 * sigma01 + c2) / (sigma00 + sigma11 + c2)
    l_map = (2 * mu0 * mu1 + c1) / (mu0**2 + mu1**2 + c1)
    return (
        jnp.mean(l_map * cs_map, axis=(-3, -2, -1)),
        jnp.mean(cs_map, axis=(-3, -2, -1)),
    )


def _avg_pool2(img):
    h, w = img.shape[-3], img.shape[-2]
    img = img[..., : h - h % 2, : w - w % 2, :]
    return 0.25 * (
        img[..., 0::2, 0::2, :]
        + img[..., 1::2, 0::2, :]
        + img[..., 0::2, 1::2, :]
        + img[..., 1::2, 1::2, :]
    )


def ms_ssim(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    weights=_MSSSIM_WEIGHTS,
):
    """Multi-scale SSIM of [..., H, W, C] images (5 scales)."""
    weights = jnp.asarray(weights)
    mcs = []
    s = None
    for i in range(len(weights)):
        s, cs = _ssim_and_cs(
            img0, img1, max_val, filter_size, filter_sigma, k1, k2
        )
        if i < len(weights) - 1:
            mcs.append(jax.nn.relu(cs))
            img0 = _avg_pool2(img0)
            img1 = _avg_pool2(img1)
    mcs = jnp.stack(mcs, 0)  # [scales-1, ...]
    return jnp.prod(mcs ** weights[:-1, None], 0) * jax.nn.relu(s) ** weights[-1]


def psnr(img0, img1, max_val: float = 1.0):
    mse = jnp.mean((img0 - img1) ** 2)
    return -10.0 / jnp.log(10.0) * jnp.log(mse / max_val**2)


def masked_psnr(img0, img1, mask):
    """Per-image PSNR over masked pixels (alky/vis_utils.py:img2psnr_mask)."""
    mask = mask.reshape(mask.shape + (1,) * (img0.ndim - mask.ndim))
    se = (img0 - img1) ** 2 * mask
    denom = jnp.sum(jnp.broadcast_to(mask, img0.shape))
    mse = jnp.sum(se) / jnp.maximum(denom, 1)
    return -10.0 / jnp.log(10.0) * jnp.log(mse)
