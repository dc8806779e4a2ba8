"""Loss assembly for both trainers.

`vanilla_losses` reproduces the ConsistentNeRF PyTorch trainer's total loss
(`run_nerf_view.py:1577-1906`): masked/soft-masked RGB MSE, the MiDaS
patch loss (x0.001), patch SSIM (x-0.005) and patch LPIPS (x+0.005), masked
depth MSE, each applied to both fine and coarse outputs.

`mip_losses` reproduces the RegNeRF JAX trainer's loss
(`RegNeRF/train.py:97-241`): per-level lossmult RGB, masked depth MSE with
dataset-specific normalization, the MiDaS patch loss, annealed depth
TV-norm on random-pose patches, and weight decay.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from consistentnerf_tpu.consistency import masks as mask_losses
from consistentnerf_tpu.consistency.monodepth import midas_patch_loss
from consistentnerf_tpu.core import mathx
from consistentnerf_tpu.train import image_metrics


def tree_sum(tree):
    return jax.tree_util.tree_reduce(lambda x, y: x + y, tree, initializer=0)


def tree_norm(tree):
    return jnp.sqrt(tree_sum(jax.tree_util.tree_map(lambda x: jnp.sum(x**2),
                                                    tree)))


def _rgb_loss(pred, target, mask, cfg, temp):
    if cfg.hardmask or cfg.softmask:
        # The reference folds softmask into the hardmask branch at
        # run_nerf_view.py:1645 (`if args.hardmask or args.softmask`).
        return mask_losses.hardmask_rgb_loss(pred, target, mask,
                                             cfg.hardmask_coef)
    if cfg.softLpmask:
        return mask_losses.img2mse_softLpmask(pred, target, cfg.Lp_coef)
    return mask_losses.img2mse(pred, target)


def _depth_loss(pred_depth, prior_depth, mask, cfg, far, temp):
    if cfg.hardmask or cfg.softmask:
        return mask_losses.hardmask_depth_loss(pred_depth, prior_depth, mask,
                                               far)
    if cfg.softLpmask:
        return mask_losses.img2mse_softLpmask(
            pred_depth / far, prior_depth / far, cfg.Lp_coef
        )
    if cfg.with_depth_norm:
        return mask_losses.unmasked_depth_loss(pred_depth, prior_depth, mask,
                                               normalize_far=far)
    return mask_losses.unmasked_depth_loss(pred_depth, prior_depth, mask)


def _patch_terms(rgb_pred, depth_pred, batch, cfg, lpips_params):
    """MiDaS + SSIM + LPIPS patch terms (run_nerf_view.py:1679-1728)."""
    ps, npatch = cfg.patch_size, cfg.n_patches
    p2 = ps * ps
    mono = midas_patch_loss(depth_pred, batch["mono_disp"], ps, npatch)

    img_pred = rgb_pred[: npatch * p2].reshape(npatch, ps, ps, 3)
    img_gt = batch["rgb"][: npatch * p2].reshape(npatch, ps, ps, 3)
    ssim_val = jnp.mean(image_metrics.ssim(img_pred, img_gt))

    if lpips_params is not None:
        from consistentnerf_tpu.train import lpips as lpips_mod

        lp = jnp.mean(
            lpips_mod.lpips(lpips_params, img_pred * 2 - 1, img_gt * 2 - 1)
        )
    else:
        lp = jnp.array(0.0)
    return mono, ssim_val, lp


def vanilla_losses(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    cfg,
    far: float,
    temp: float = 1.0,
    lpips_params: Optional[Any] = None,
):
    """Total loss + stats for the vanilla backbone.

    batch keys: 'rgb' [N,3], 'depth' [N] (MVS prior), 'mask' [N],
    'mono_disp' [N]; the first n_patches*patch_size^2 rays are patches.
    """
    target = batch["rgb"]
    mask = batch["mask"]
    # Pseudo-label batches downweight the reconstruction terms x0.1
    # (run_nerf_view.py:1670-1673); regular batches carry scale 1.
    loss_scale = batch.get("loss_scale", jnp.array(1.0))
    stats = {}

    loss = jnp.array(0.0)

    # Patch terms assume the first n_patches*patch_size^2 rays form coherent
    # 16x16 patches. That holds for the single-image batcher only: in
    # use_batching mode (AllImagesBatcher) every ray is an independent draw
    # from the shuffled global pool, so patch SSIM/LPIPS and the scale/shift
    # -invariant mono-depth loss would inject meaningless gradients — skip
    # them there (static gate; the reference's use_batching path likewise
    # has no patch terms, run_nerf.py:680-701).
    has_patches = (not cfg.use_batching) and cfg.n_patches > 0

    # Fine level.
    img_loss = _rgb_loss(outputs["rgb"], target, mask, cfg, temp)
    loss = loss + loss_scale * img_loss
    stats["img_loss"] = img_loss
    stats["psnr"] = mathx.mse_to_psnr(
        mask_losses.img2mse(outputs["rgb"], target)
    )

    if has_patches:
        mono, ssim_val, lp = _patch_terms(
            outputs["rgb"], outputs["depth"], batch, cfg, lpips_params
        )
        loss = (
            loss
            + cfg.mono_depth_loss_mult * mono
            - cfg.patch_ssim_loss_mult * ssim_val
            + cfg.patch_lpips_loss_mult * lp
        )
        stats["mono_depth_loss"] = mono
        stats["patch_ssim"] = ssim_val
        stats["patch_lpips"] = lp

    if cfg.with_depth_loss:
        depth_loss = _depth_loss(
            outputs["depth"], batch["depth"], mask, cfg, far, temp
        )
        loss = loss + loss_scale * depth_loss
        stats["depth_loss"] = depth_loss

    # Coarse level (mirrors the fine-level terms, run_nerf_view.py:1785-1906).
    if "rgb0" in outputs:
        img_loss0 = _rgb_loss(outputs["rgb0"], target, mask, cfg, temp)
        loss = loss + loss_scale * img_loss0
        stats["img_loss0"] = img_loss0
        stats["psnr0"] = mathx.mse_to_psnr(
            mask_losses.img2mse(outputs["rgb0"], target)
        )

        if has_patches:
            mono0, ssim0, lp0 = _patch_terms(
                outputs["rgb0"], outputs["depth0"], batch, cfg, lpips_params
            )
            loss = (
                loss
                + cfg.mono_depth_loss_mult * mono0
                - cfg.patch_ssim_loss_mult * ssim0
                + cfg.patch_lpips_loss_mult * lp0
            )
            stats["mono_depth_loss0"] = mono0

        if cfg.with_depth_loss:
            depth_loss0 = _depth_loss(
                outputs["depth0"], batch["depth"], mask, cfg, far, temp
            )
            loss = loss + loss_scale * depth_loss0
            stats["depth_loss0"] = depth_loss0

    stats["loss"] = loss
    return loss, stats


def mip_losses(
    renderings,
    renderings_random,
    batch: Dict[str, Any],
    variables,
    cfg,
    tvnorm_loss_weight: float,
):
    """Total loss + stats for the mip/RegNeRF backbone.

    Formula provenance: RegNeRF/train.py:97-241 (lossmult-weighted RGB
    MSE per level, dataset-normalized masked depth MSE, MiDaS patch term,
    annealed TV norm on random-pose patches, mean-square weight decay).
    The stats dict keys are part of the train-loop logging contract.
    """
    rays = batch["rays"]
    lossmult = rays.lossmult
    if cfg.disable_multiscale_loss:
        lossmult = jnp.ones_like(lossmult)

    # Mean squared parameter value over every weight in the model.
    param_sq_sum = tree_sum(
        jax.tree_util.tree_map(lambda z: jnp.sum(z**2), variables)
    )
    param_count = tree_sum(
        jax.tree_util.tree_map(lambda z: jnp.prod(jnp.array(z.shape)),
                               variables)
    )
    weight_l2 = jnp.nan_to_num(
        jnp.where(param_count == 0, 0, param_sq_sum / param_count)
    )

    def rgb_mse(rendering):
        sq_err = lossmult * (rendering["rgb"] - batch["rgb"][..., :3]) ** 2
        return sq_err.sum() / (lossmult.sum() + 0.0001)

    def depth_mse(rendering):
        if not cfg.compute_depth_metrics:
            return 0.0
        pred = rendering["distance_mean"]
        prior = batch["dpts"]
        # DTU (and any hardmask run) supervises only mask-valid pixels;
        # LLFF normalizes by the scene bound, Blender by far.
        if cfg.dataset_type == "dtu" or cfg.use_hardmask:
            mask = batch["masks"]
            pred = pred * mask
            prior = prior * mask
            if cfg.dataset_type == "llff":
                scale = batch["bounds"].max()
            elif cfg.dataset_type == "blender":
                scale = cfg.far
            else:
                scale = 1.0
        else:
            scale = (batch["bounds"].max() if cfg.dataset_type == "llff"
                     else 1.0)
        return (((prior - pred) / scale) ** 2).mean()

    def mono_depth_term(rendering):
        if not cfg.compute_mono_depth_metrics:
            return 0.0
        term = midas_patch_loss(
            rendering["distance_mean"].reshape(-1),
            batch["mono_dpts"].reshape(-1),
            16,
            4,
        )
        return term * 0.01 if cfg.dataset_type == "blender" else term

    per_level_rgb = [rgb_mse(r) for r in renderings]
    per_level_depth = [depth_mse(r) for r in renderings]
    per_level_mono = [mono_depth_term(r) for r in renderings]

    wants_tv = cfg.depth_tvnorm_loss_mult != 0.0 or cfg.depth_tvnorm_decay
    if not wants_tv or renderings_random is None:
        per_level_tv = [jnp.array(0.0)]
    else:
        ps = cfg.random_patch_size

        def as_patches(x, dim):
            return x.reshape(-1, ps, ps, dim)

        per_level_tv = []
        for rendering in renderings_random:
            depth_patches = as_patches(
                rendering[cfg.depth_tvnorm_selector], 1
            )
            opacity_w = (
                jax.lax.stop_gradient(
                    as_patches(rendering["acc"], 1)[:, :-1, :-1]
                )
                * cfg.depth_tvnorm_mask_weight
            )
            per_level_tv.append(
                mathx.compute_tv_norm(
                    depth_patches, cfg.depth_tvnorm_type, opacity_w
                ).mean()
            )

    rgb_v = jnp.array(per_level_rgb)
    depth_v = jnp.array(per_level_depth)
    mono_v = jnp.array(per_level_mono)
    tv_v = jnp.array(per_level_tv)

    tv_weight = (
        tvnorm_loss_weight if cfg.depth_tvnorm_decay
        else cfg.depth_tvnorm_loss_mult
    )

    def final_plus_coarse(v, mult=1.0):
        # Last level at full weight, earlier levels at coarse_loss_mult.
        return mult * v[-1] + mult * cfg.coarse_loss_mult * jnp.sum(v[:-1])

    loss = (
        final_plus_coarse(rgb_v)
        + final_plus_coarse(depth_v, 0.1)
        + final_plus_coarse(mono_v, 0.1)
        + cfg.weight_decay_mult * weight_l2
        + (tv_weight * tv_v[-1]
           + cfg.coarse_loss_mult * jnp.sum(tv_v[:-1]))
    )

    stats = {
        "loss": loss,
        "losses": rgb_v,
        "depth_mses": depth_v,
        "mono_depth_mses": mono_v,
        "patch_tv_losses": tv_v,
        "weight_l2": weight_l2,
        "psnr": mathx.mse_to_psnr(rgb_v[-1]),
        "psnrs": mathx.mse_to_psnr(rgb_v),
    }
    return loss, stats
