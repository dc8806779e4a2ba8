"""mip-NeRF / RegNeRF backbone model.

Mirrors `RegNeRF/internal/models.py:29-122`: two sampling levels sharing one
MLP, cone casting + IPE, blurpool inverse-CDF resampling between levels.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from consistentnerf_tpu.core import rendering, sampling
from consistentnerf_tpu.core.spacing import CurveSpec
from consistentnerf_tpu.models.mlp import MipMLP


class MipNeRF(nn.Module):
    """Two-level cone-cast NeRF with a shared MLP."""

    num_samples: int = 96
    num_levels: int = 2
    stop_level_grad: bool = True
    use_viewdirs: bool = True
    genspace_fn: CurveSpec = None  # spacing curve ('linear'/'log'/'reciprocal')
    ray_shape: str = "cone"
    disable_integration: bool = False
    single_jitter: bool = False
    white_background: bool = True
    vis_num_rays: int = 64
    # MLP config forwarded to MipMLP.
    net_depth: int = 8
    net_width: int = 256
    max_deg_point: int = 16
    disable_normals: bool = False
    density_noise: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        rng: Optional[jax.Array],
        rays,
        resample_padding: float = 0.01,
        compute_extras: bool = False,
    ):
        """Returns a list of per-level rendering dicts (coarse first)."""
        mlp = MipMLP(
            net_depth=self.net_depth,
            net_width=self.net_width,
            max_deg_point=self.max_deg_point,
            disable_normals=self.disable_normals,
            density_noise=self.density_noise,
            dtype=self.dtype,
        )

        renderings = []
        t_vals = None
        weights = None
        for i_level in range(self.num_levels):
            if rng is None:
                key = None
            else:
                key, rng = jax.random.split(rng)

            if i_level == 0:
                t_vals, samples = sampling.sample_along_rays(
                    key,
                    rays.origins,
                    rays.directions,
                    rays.radii,
                    self.num_samples,
                    rays.near,
                    rays.far,
                    self.genspace_fn,
                    self.ray_shape,
                    self.single_jitter,
                )
            else:
                t_vals, samples = sampling.resample_along_rays(
                    key,
                    rays.origins,
                    rays.directions,
                    rays.radii,
                    t_vals,
                    weights,
                    self.ray_shape,
                    self.stop_level_grad,
                    resample_padding,
                    self.single_jitter,
                )

            if self.disable_integration:
                samples = (samples[0], jnp.zeros_like(samples[1]))

            # Flatten (rays, samples) for the MLP: 2-D matmuls tile onto
            # the MXU without the lane-padded 3-D batched-dot layouts.
            means, covs = samples
            n, s = means.shape[:2]
            samples_flat = (
                means.reshape(n * s, means.shape[-1]),
                covs.reshape((n * s,) + covs.shape[len(means.shape) - 1:]),
            )
            views_flat = None
            if self.use_viewdirs:
                views_flat = jnp.broadcast_to(
                    rays.viewdirs[:, None, :], (n, s, 3)
                ).reshape(n * s, 3)
            rgb, density, normals = mlp(rng, samples_flat, views_flat)
            rgb = rgb.reshape(n, s, rgb.shape[-1])
            density = density.reshape(n, s)
            normals = normals.reshape(n, s, normals.shape[-1])

            weights, _, _, delta = rendering.compute_alpha_weights(
                density, t_vals, rays.directions
            )
            renderings.append(
                rendering.volumetric_rendering(
                    rgb,
                    weights,
                    normals,
                    t_vals,
                    self.white_background,
                    self.vis_num_rays,
                    compute_extras,
                    delta,
                )
            )
        return renderings
