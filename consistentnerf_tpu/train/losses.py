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
    """Total loss + stats for the mip/RegNeRF backbone (train.py:97-241)."""
    rays = batch["rays"]
    lossmult = rays.lossmult
    if cfg.disable_multiscale_loss:
        lossmult = jnp.ones_like(lossmult)

    # weight decay over all params (train.py:102-106)
    fract1 = tree_sum(jax.tree_util.tree_map(lambda z: jnp.sum(z**2),
                                             variables))
    fract2 = tree_sum(
        jax.tree_util.tree_map(lambda z: jnp.prod(jnp.array(z.shape)),
                               variables)
    )
    weight_l2 = jnp.nan_to_num(jnp.where(fract2 == 0, 0, fract1 / fract2))

    losses = []
    depth_mses = []
    mono_depth_mses = []
    losses_georeg = []

    for rendering in renderings:
        numer = (
            lossmult * (rendering["rgb"] - batch["rgb"][..., :3]) ** 2
        ).sum()
        denom = lossmult.sum()
        losses.append(numer / (denom + 0.0001))

        if cfg.compute_depth_metrics:
            if cfg.dataset_type == "dtu" or cfg.use_hardmask:
                mask = batch["masks"]
                if cfg.dataset_type == "llff":
                    bmax = batch["bounds"].max()
                    depth_mse = (
                        (batch["dpts"] * mask / bmax
                         - rendering["distance_mean"] * mask / bmax) ** 2
                    ).mean()
                elif cfg.dataset_type == "blender":
                    depth_mse = (
                        (batch["dpts"] * mask / cfg.far
                         - rendering["distance_mean"] * mask / cfg.far) ** 2
                    ).mean()
                else:
                    depth_mse = (
                        (batch["dpts"] * mask
                         - rendering["distance_mean"] * mask) ** 2
                    ).mean()
            else:
                if cfg.dataset_type == "llff":
                    bmax = batch["bounds"].max()
                    depth_mse = (
                        (batch["dpts"] / bmax
                         - rendering["distance_mean"] / bmax) ** 2
                    ).mean()
                else:
                    depth_mse = (
                        (batch["dpts"] - rendering["distance_mean"]) ** 2
                    ).mean()
            depth_mses.append(depth_mse)
        else:
            depth_mses.append(0.0)

        if cfg.compute_mono_depth_metrics:
            dm = midas_patch_loss(
                rendering["distance_mean"].reshape(-1),
                batch["mono_dpts"].reshape(-1),
                16,
                4,
            )
            if cfg.dataset_type == "blender":
                dm = dm * 0.01
            mono_depth_mses.append(dm)
        else:
            mono_depth_mses.append(0.0)

    render_random_rays = (cfg.depth_tvnorm_loss_mult != 0.0) or (
        cfg.depth_tvnorm_decay
    )
    if not render_random_rays or renderings_random is None:
        losses_georeg = [jnp.array(0.0)]
    else:
        ps = cfg.random_patch_size
        reshape_to_patch = lambda x, dim: x.reshape(-1, ps, ps, dim)
        for rendering in renderings_random:
            depth = reshape_to_patch(rendering[cfg.depth_tvnorm_selector], 1)
            weighting = (
                jax.lax.stop_gradient(
                    reshape_to_patch(rendering["acc"], 1)[:, :-1, :-1]
                )
                * cfg.depth_tvnorm_mask_weight
            )
            losses_georeg.append(
                mathx.compute_tv_norm(
                    depth, cfg.depth_tvnorm_type, weighting
                ).mean()
            )

    losses = jnp.array(losses)
    depth_mses = jnp.array(depth_mses)
    mono_depth_mses = jnp.array(mono_depth_mses)
    losses_georeg = jnp.array(losses_georeg)

    tv_weight = (
        tvnorm_loss_weight if cfg.depth_tvnorm_decay
        else cfg.depth_tvnorm_loss_mult
    )
    loss = (
        losses[-1]
        + cfg.coarse_loss_mult * jnp.sum(losses[:-1])
        + 0.1 * depth_mses[-1]
        + 0.1 * cfg.coarse_loss_mult * jnp.sum(depth_mses[:-1])
        + 0.1 * mono_depth_mses[-1]
        + 0.1 * cfg.coarse_loss_mult * jnp.sum(mono_depth_mses[:-1])
        + cfg.weight_decay_mult * weight_l2
        + (tv_weight * losses_georeg[-1]
           + cfg.coarse_loss_mult * jnp.sum(losses_georeg[:-1]))
    )

    stats = {
        "loss": loss,
        "losses": losses,
        "depth_mses": depth_mses,
        "mono_depth_mses": mono_depth_mses,
        "losses_georeg": losses_georeg,
        "weight_l2": weight_l2,
        "psnr": mathx.mse_to_psnr(losses[-1]),
        "psnrs": mathx.mse_to_psnr(losses),
    }
    return loss, stats
