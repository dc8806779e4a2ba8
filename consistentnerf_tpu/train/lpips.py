"""LPIPS (VGG16) perceptual metric in JAX.

The reference evaluates LPIPS with the `lpips` PyTorch package (VGG trunk,
`run_nerf_view.py:40`, `RegNeRF/eval.py:89`). This module reimplements the
same network — VGG16 conv features at relu1_2/relu2_2/relu3_3/relu4_3/
relu5_3, unit-normalized per channel, 1x1 linear heads, spatially averaged —
as a pure-JAX function over a weight pytree.

Pretrained weights cannot ship with this repo (no network egress at build
time); load them with `load_weights(path)` from an .npz produced by
`cli/export_lpips_weights.py` on any machine with the `lpips` package, or
pass `params=None` to get a deterministic randomly-initialized trunk, which
still defines a valid (if uncalibrated) perceptual distance — useful for
wiring tests. Metrics reported without calibrated weights are flagged by
`is_calibrated`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: (out_channels, num_convs) per block.
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# ImageNet normalization used by lpips.LPIPS (scaling layer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_params(rng: jax.Array):
    """Deterministic random init with the right shapes (uncalibrated)."""
    params = {"convs": [], "lins": []}
    c_in = 3
    for bi, (c_out, n_convs) in enumerate(_VGG_BLOCKS):
        block = []
        for ci in range(n_convs):
            rng, k = jax.random.split(rng)
            w = jax.random.normal(k, (3, 3, c_in, c_out)) * np.sqrt(
                2.0 / (9 * c_in)
            )
            block.append({"w": w, "b": jnp.zeros((c_out,))})
            c_in = c_out
        params["convs"].append(block)
        rng, k = jax.random.split(rng)
        params["lins"].append(
            jnp.abs(jax.random.normal(k, (c_out,))) * 0.01
        )
    return params


def load_weights(path: str):
    """Load an .npz of converted lpips-vgg weights.

    Expected keys: conv{b}_{i}_w [3,3,Cin,Cout] (HWIO), conv{b}_{i}_b [Cout],
    lin{b} [C] (the squeezed 1x1 linear head weights).
    """
    data = np.load(path)
    params = {"convs": [], "lins": []}
    for bi, (c_out, n_convs) in enumerate(_VGG_BLOCKS):
        block = []
        for ci in range(n_convs):
            block.append(
                {
                    "w": jnp.asarray(data[f"conv{bi}_{ci}_w"]),
                    "b": jnp.asarray(data[f"conv{bi}_{ci}_b"]),
                }
            )
        params["convs"].append(block)
        params["lins"].append(jnp.asarray(data[f"lin{bi}"]))
    return params


def _conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _features(params, x):
    """VGG16 relu features at the 5 LPIPS taps. x: [N, H, W, 3] in [-1, 1]."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    for bi, block in enumerate(params["convs"]):
        for conv in block:
            x = jax.nn.relu(_conv(x, conv["w"], conv["b"]))
        feats.append(x)
        if bi < len(params["convs"]) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips(params, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance between [N, H, W, 3] images in [-1, 1]. Returns [N]."""
    f0s = _features(params, img0)
    f1s = _features(params, img1)
    total = 0.0
    for f0, f1, lin in zip(f0s, f1s, params["lins"]):
        # eps is added to the norm, not under the sqrt — exactly the
        # lpips package's normalize_tensor (lpips/__init__.py).
        eps = 1e-10
        n0 = f0 / (jnp.sqrt(jnp.sum(f0**2, -1, keepdims=True)) + eps)
        n1 = f1 / (jnp.sqrt(jnp.sum(f1**2, -1, keepdims=True)) + eps)
        diff2 = (n0 - n1) ** 2
        total = total + jnp.mean(jnp.sum(diff2 * lin, -1), axis=(-2, -1))
    return total


class LPIPS:
    """Convenience wrapper holding weights (calibrated or random)."""

    def __init__(self, weights_path: Optional[str] = None, seed: int = 0):
        if weights_path and os.path.exists(weights_path):
            self.params = load_weights(weights_path)
            self.is_calibrated = True
        else:
            self.params = init_params(jax.random.PRNGKey(seed))
            self.is_calibrated = False
        self._fn = jax.jit(lpips)

    def __call__(self, img0, img1):
        """img0/img1 in [0, 1], [N, H, W, 3] (or [H, W, 3])."""
        if img0.ndim == 3:
            img0, img1 = img0[None], img1[None]
        return self._fn(self.params, img0 * 2 - 1, img1 * 2 - 1)
