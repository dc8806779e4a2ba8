"""Model construction from a Config."""

from __future__ import annotations

import jax.numpy as jnp

from consistentnerf_tpu.models.mipnerf import MipNeRF
from consistentnerf_tpu.models.nerf import VanillaNeRF

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def make_model(cfg):
    dtype = _DTYPES[cfg.compute_dtype]
    if cfg.backbone == "vanilla":
        return VanillaNeRF(
            num_samples=cfg.N_samples,
            num_importance=cfg.N_importance,
            multires=cfg.multires,
            multires_views=cfg.multires_views,
            use_viewdirs=cfg.use_viewdirs,
            white_bkgd=cfg.white_bkgd,
            raw_noise_std=cfg.raw_noise_std,
            lindisp=cfg.lindisp,
            perturb=cfg.perturb > 0,
            net_depth=cfg.netdepth,
            net_width=cfg.netwidth,
            remat=cfg.remat_mlp,
            dtype=dtype,
        )
    if cfg.backbone == "mipnerf":
        return MipNeRF(
            num_samples=cfg.mip_num_samples,
            num_levels=cfg.mip_num_levels,
            stop_level_grad=cfg.stop_level_grad,
            use_viewdirs=cfg.use_viewdirs,
            genspace_fn=cfg.genspace_fn,
            ray_shape=cfg.ray_shape,
            disable_integration=cfg.disable_integration,
            single_jitter=cfg.single_jitter,
            white_background=cfg.white_bkgd,
            vis_num_rays=cfg.vis_num_rays,
            net_depth=cfg.netdepth,
            net_width=cfg.netwidth,
            max_deg_point=cfg.max_deg_point,
            disable_normals=cfg.disable_normals,
            density_noise=cfg.density_noise,
            dtype=dtype,
        )
    raise ValueError(f"Unknown backbone {cfg.backbone!r}")
