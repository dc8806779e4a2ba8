"""Positional encodings: NeRF PE (two orderings) and mip-NeRF IPE.

Two PE flavours exist in the reference with *different feature orderings*:

* vanilla/torch ordering (`run_nerf_helpers.py:Embedder`, :15-45):
  [x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...] — sin/cos interleaved
  per frequency, each block carrying all input dims.
* mip/jax ordering (`RegNeRF/internal/mip.py:pos_enc`, :27-36):
  [x, sin(all freqs * x), cos(all freqs * x)] — all sin features first.

Both are provided; orderings matter for checkpoint compatibility, not for
training from scratch.
"""

from __future__ import annotations

import jax.numpy as jnp

from consistentnerf_tpu.core import mathx


def posenc_nerf(x: jnp.ndarray, num_freqs: int, include_identity: bool = True):
    """Torch-Embedder-ordered PE. freq bands 2^0..2^(num_freqs-1) (log sampling).

    Output dim: d * (1 + 2*num_freqs) when include_identity.
    """
    if num_freqs == 0:
        return x
    scales = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    # [..., F, d]
    xb = x[..., None, :] * scales[:, None]
    # interleave sin then cos per frequency: [..., F, 2, d]
    four = jnp.stack([mathx.safe_sin(xb), mathx.safe_cos(xb)], axis=-2)
    four = four.reshape(list(x.shape[:-1]) + [-1])
    if include_identity:
        return jnp.concatenate([x, four], axis=-1)
    return four


def pos_enc(x: jnp.ndarray, min_deg: int, max_deg: int, append_identity: bool = True):
    """mip-NeRF-ordered PE (mip.py:27-36)."""
    scales = jnp.array([2**i for i in range(min_deg, max_deg)], dtype=x.dtype)
    xb = jnp.reshape(x[..., None, :] * scales[:, None], list(x.shape[:-1]) + [-1])
    four_feat = mathx.safe_sin(
        jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1)
    )
    if append_identity:
        return jnp.concatenate([x] + [four_feat], axis=-1)
    return four_feat


def cosine_easing_window(alpha, min_freq_log2: int = 0,
                         max_freq_log2: int = 16):
    """Per-frequency easing window for annealed PE (models.py:145-169).

    Eases in each frequency band with a cosine as `alpha` goes from 0 to
    num_freqs; the first 4 bands are always fully on. Returns [2, 3*bands]
    (sin/cos rows), matching the reference's stacked output.
    """
    num_bands = max_freq_log2 - min_freq_log2
    bands = jnp.linspace(min_freq_log2, max_freq_log2, num_bands)
    x = jnp.clip(alpha - bands, 0.0, 1.0)
    values = 0.5 * (1 + jnp.cos(jnp.pi * x + jnp.pi))
    values = values.reshape(-1)
    values = jnp.concatenate([jnp.ones_like(values[:4]), values[4:]])
    values = jnp.repeat(values.reshape(-1, 1), 3, axis=1).reshape(-1)
    return jnp.stack([values, values])


def expected_sin(x, x_var, compute_var: bool = False):
    """E[sin(z)] (and optionally Var[sin(z)]) for z ~ N(x, x_var) (mip.py:39)."""
    y = jnp.exp(-0.5 * x_var) * mathx.safe_sin(x)
    if compute_var:
        y_var = jnp.maximum(
            0, 0.5 * (1 - jnp.exp(-2 * x_var) * mathx.safe_cos(2 * x)) - y**2
        )
        return y, y_var
    return y


def integrated_pos_enc(x_coord, min_deg: int, max_deg: int, diag: bool = True):
    """IPE of a Gaussian (means, covs); matches mip.py:160-192."""
    if diag:
        x, x_cov_diag = x_coord
        scales = 2 ** jnp.arange(min_deg, max_deg)
        shape = list(x.shape[:-1]) + [-1]
        y = jnp.reshape(x[..., None, :] * scales[:, None], shape)
        y_var = jnp.reshape(x_cov_diag[..., None, :] * scales[:, None] ** 2, shape)
    else:
        x, x_cov = x_coord
        num_dims = x.shape[-1]
        basis = jnp.concatenate(
            [2**i * jnp.eye(num_dims) for i in range(min_deg, max_deg)], 1
        )
        y = mathx.matmul(x, basis)
        y_var = jnp.sum((mathx.matmul(x_cov, basis)) * basis, -2)

    return expected_sin(
        jnp.concatenate([y, y + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([y_var] * 2, axis=-1),
    )
