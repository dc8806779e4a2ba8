"""Flax MLPs for both backbones.

`NeRFMLP` mirrors the vanilla-NeRF architecture of
`nerf-pytorch-master/run_nerf_helpers.py:67-130` (8x256 trunk, skip concat
after layer 4, viewdir branch of one 128-wide layer, plus ConsistentNeRF's
learnable `temp_rgb`/`temp_depth`/`depth_scale` scalars, :79-84).

`MipMLP` mirrors `RegNeRF/internal/models.py:172-280` (IPE input, softplus
density with bias -1, normals from the density gradient, rgb padding).

TPU notes: layer widths of 256 map cleanly onto the MXU; all dense layers
support a configurable compute dtype (bf16 matmuls with fp32 params) via
`dtype`.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from consistentnerf_tpu.core import encoding


class NeRFMLP(nn.Module):
    """Vanilla NeRF MLP with ConsistentNeRF temperature parameters."""

    net_depth: int = 8
    net_width: int = 256
    skips: Sequence[int] = (4,)
    use_viewdirs: bool = True
    num_density_channels: int = 1
    num_rgb_channels: int = 3
    # output_ch is only used when use_viewdirs=False (reference :100-101).
    output_ch: int = 4
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, pts_embed: jnp.ndarray, views_embed: jnp.ndarray | None):
        """pts_embed: [..., C_pts] encoded points; views_embed: [..., C_views]
        encoded viewdirs (or None). Returns [..., 4] rgb+density logits."""
        dense = functools.partial(
            nn.Dense, dtype=self.dtype, kernel_init=self.kernel_init
        )
        # ConsistentNeRF's learnable loss temperatures ride along in the
        # param tree (consumed by soft-mask losses, not the forward pass).
        self.param("temp_rgb", lambda k: jnp.full((1,), -0.7))
        self.param("temp_depth", lambda k: jnp.full((1,), -0.7))
        self.param("depth_scale", lambda k: jnp.full((1,), 1.0))

        h = pts_embed.astype(self.dtype)
        for i in range(self.net_depth):
            h = dense(self.net_width, name=f"pts_{i}")(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([pts_embed.astype(self.dtype), h], -1)

        if self.use_viewdirs:
            assert views_embed is not None
            alpha = dense(self.num_density_channels, name="alpha")(h)
            feature = dense(self.net_width, name="feature")(h)
            h = jnp.concatenate([feature, views_embed.astype(self.dtype)], -1)
            h = nn.relu(dense(self.net_width // 2, name="views_0")(h))
            rgb = dense(self.num_rgb_channels, name="rgb")(h)
            out = jnp.concatenate([rgb, alpha], -1)
        else:
            out = dense(self.output_ch, name="output")(h)
        return out.astype(jnp.float32)


class MipMLP(nn.Module):
    """mip-NeRF MLP (IPE in, rgb/density/normals out)."""

    net_depth: int = 8
    net_width: int = 256
    net_depth_viewdirs: int = 1
    net_width_viewdirs: int = 128
    net_activation: Callable = nn.relu
    weight_init: Callable = jax.nn.initializers.glorot_uniform()
    skip_layer: int = 4
    num_rgb_channels: int = 3
    min_deg_point: int = 0
    max_deg_point: int = 16
    deg_view: int = 4
    density_activation: Callable = nn.softplus
    density_noise: float = 0.0
    density_bias: float = -1.0
    rgb_activation: Callable = nn.sigmoid
    rgb_padding: float = 0.001
    disable_normals: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rng, samples: Tuple[jnp.ndarray, jnp.ndarray],
                 viewdirs: jnp.ndarray | None = None):
        dense_layer = functools.partial(
            nn.Dense, kernel_init=self.weight_init, dtype=self.dtype
        )

        def predict_density(rng, means, covs):
            inputs = encoding.integrated_pos_enc(
                (means, covs), self.min_deg_point, self.max_deg_point
            )
            x = inputs.astype(self.dtype)
            for i in range(self.net_depth):
                x = dense_layer(self.net_width)(x)
                x = self.net_activation(x)
                if i % self.skip_layer == 0 and i > 0:
                    x = jnp.concatenate([x, inputs.astype(self.dtype)], -1)
            raw_density = dense_layer(1)(x)[..., 0].astype(jnp.float32)
            if (rng is not None) and (self.density_noise > 0):
                key, rng = jax.random.split(rng)
                raw_density += self.density_noise * jax.random.normal(
                    key, raw_density.shape, dtype=raw_density.dtype
                )
            density = self.density_activation(raw_density + self.density_bias)
            return density, x

        means, covs = samples
        if self.disable_normals:
            density, x = predict_density(rng, means, covs)
            normals = jnp.full_like(means, fill_value=jnp.nan)
        else:
            # Normals = -normalized grad of density wrt position, computed by
            # vmapping value_and_grad over flattened samples (models.py:244).
            means_flat = means.reshape([-1, means.shape[-1]])
            covs_flat = covs.reshape(
                [-1] + list(covs.shape[len(means.shape) - 1:])
            )
            predict_density_and_grad_fn = jax.vmap(
                jax.value_and_grad(predict_density, argnums=1, has_aux=True),
                in_axes=(None, 0, 0),
            )
            (density_flat, x_flat), density_grad_flat = (
                predict_density_and_grad_fn(rng, means_flat, covs_flat)
            )
            density = density_flat.reshape(means.shape[:-1])
            x = x_flat.reshape(list(means.shape[:-1]) + [x_flat.shape[-1]])
            density_grad = density_grad_flat.reshape(means.shape)
            eps = jnp.finfo(jnp.float32).eps
            normals = -density_grad / jnp.sqrt(
                jnp.maximum(jnp.sum(density_grad**2, axis=-1, keepdims=True),
                            eps)
            )

        if viewdirs is not None:
            viewdirs_enc = encoding.pos_enc(
                viewdirs, min_deg=0, max_deg=self.deg_view, append_identity=True
            )
            bottleneck = dense_layer(self.net_width)(x)
            if viewdirs_enc.ndim < bottleneck.ndim:
                # Per-ray viewdirs against [..., S, W] samples: broadcast
                # over the samples axis (models.py:269-271). Pre-flattened
                # inputs arrive with matching rank and skip this.
                viewdirs_enc = jnp.broadcast_to(
                    viewdirs_enc[..., None, :].astype(self.dtype),
                    list(bottleneck.shape[:-1]) + [viewdirs_enc.shape[-1]],
                )
            else:
                viewdirs_enc = viewdirs_enc.astype(self.dtype)
            x = jnp.concatenate([bottleneck, viewdirs_enc], axis=-1)
            for _ in range(self.net_depth_viewdirs):
                x = dense_layer(self.net_width_viewdirs)(x)
                x = self.net_activation(x)
        rgb = self.rgb_activation(
            dense_layer(self.num_rgb_channels)(x).astype(jnp.float32)
        )
        rgb = rgb * (1 + 2 * self.rgb_padding) - self.rgb_padding

        return rgb, density, normals
