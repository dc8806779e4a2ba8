"""Single-view (monocular/MiDaS) depth consistency patch loss.

Scale/shift-invariant disparity MSE on 16x16 patches, identical in both
reference trainers (`run_nerf_view.py:1679-1728` == `RegNeRF/train.py:
158-184`): predicted depth is inverted to disparity, both prediction and
the MiDaS prior are min/max-normalized per patch over valid (prior > 0)
pixels, a scalar shift `alpha` aligns their means, and the residual is an
MSE averaged over patches with a factor 1/2.
"""

from __future__ import annotations

import jax.numpy as jnp


def midas_patch_loss(
    pred_depth: jnp.ndarray,
    mono_disp: jnp.ndarray,
    patch_size: int = 16,
    num_patches: int = 4,
) -> jnp.ndarray:
    """Scale/shift-invariant patch loss.

    pred_depth: [>= num_patches*patch_size^2] predicted per-ray depth; the
    first num_patches*patch_size^2 entries are the patch rays (batch layout
    contract of the data pipeline). mono_disp: same-shaped MiDaS disparity
    prior. Returns a scalar.
    """
    p2 = patch_size * patch_size
    # Disparity from predicted depth, with the reference's epsilon clamp.
    pred_disp_all = 1.0 / jnp.where(pred_depth <= 0, 1e-4, pred_depth)

    pred = jnp.nan_to_num(pred_disp_all[: num_patches * p2]).reshape(
        num_patches, p2
    )
    gt = jnp.nan_to_num(mono_disp[: num_patches * p2]).reshape(num_patches, p2)

    mask = jnp.where(gt > 0, 1.0, 0.0)

    # Normalize the prior over its valid pixels.
    gt_min = jnp.min(jnp.where(gt > 0, gt, 1e5), axis=-1, keepdims=True)
    gt_max = jnp.max(gt, axis=-1, keepdims=True)
    gt_n = mask * (gt - gt_min) / (gt_max - gt_min + 1e-4)

    # Normalize the prediction over masked positive pixels.
    pred_min = jnp.min(
        jnp.where(mask * pred > 0, pred, 1e5), axis=-1, keepdims=True
    )
    pred_max = jnp.max(mask * pred, axis=-1, keepdims=True)
    pred_n = mask * (pred - pred_min) / (pred_max - pred_min + 1e-4)

    alpha = jnp.mean(pred_n - gt_n, axis=-1, keepdims=True)
    per_patch = jnp.mean((gt_n - pred_n + alpha) ** 2, axis=-1)
    return jnp.sum(per_patch) / num_patches / 2
