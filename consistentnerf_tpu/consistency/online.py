"""Online (in-training) reprojection consistency — the `ss_loss` variant.

Reproduces `run_nerf_view_test.py:900-966`: each step, batch pixels are
lifted to 3D via the MVS depth prior and projected into a random reference
train view; the model renders the corresponding reference rays and is
supervised against the reference image/depth at those pixels; the main
RGB/depth losses are stochastically gated by the consistency mask.

TPU-native redesign: the reference filters to the data-dependent set of
in-bounds points (dynamic shapes); here every ray keeps a slot and
out-of-bounds / occluded points get zero loss weight — same gradients,
static shapes, one jitted program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from consistentnerf_tpu.consistency import masks as mask_losses
from consistentnerf_tpu.consistency import reproject
from consistentnerf_tpu.core.rays import Rays


def build_ref_rays(
    points_w: jnp.ndarray,
    ref_pose: jnp.ndarray,
    ref_image: jnp.ndarray,
    ref_depth: jnp.ndarray,
    K: jnp.ndarray,
    occlusion_threshold: float = 0.1,
    use_occlusion: bool = True,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Project points into the ref view and gather supervision targets.

    points_w: [N, 3]; ref_pose: [3, 4] c2w; ref_image: [H, W, 3];
    ref_depth: [H, W]. Returns (dict with ref ray origins/directions,
    gathered rgb/depth targets, weight mask), where weight combines the
    bounds mask and (optionally) the occlusion test with the reference's
    threshold-doubling semantics.
    """
    H, W = ref_depth.shape
    c2w = jnp.eye(4).at[:3, :4].set(ref_pose)
    w2c = jnp.linalg.inv(c2w)

    x, y, z_ref, in_bounds = reproject.world_to_ref_pixels(
        points_w, w2c, K, H, W
    )
    xi = jnp.clip(x, 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(y, 0, H - 1).astype(jnp.int32)
    rgb_ref = ref_image[yi, xi]
    depth_ref = ref_depth[yi, xi]

    weight = in_bounds.astype(jnp.float32)
    if use_occlusion:
        diff = jnp.abs(z_ref - depth_ref)
        diff_for_min = jnp.where(in_bounds, diff, jnp.inf)
        tau = reproject._effective_threshold(
            jnp.min(diff_for_min), occlusion_threshold
        )
        weight = weight * (diff < tau).astype(jnp.float32)

    # Reference-view rays through the projected pixels. NOTE an intentional
    # deviation from get_ref_rays (run_nerf_view.py:576-627): the reference
    # builds [(x-cx)/fx, (y-cy)/fy, +1] and rotates it by the OpenGL c2w,
    # which under its own get_rays convention ([(i-cx)/fx, -(j-cy)/fy, -1],
    # run_nerf_helpers.py:164) yields rays that are y-mirrored and point
    # *behind* the camera — they do not pass through the pixels whose
    # rgb/depth are gathered as targets. We use the consistent pixel-ray
    # convention so the rendered ray and its supervision target agree
    # (verified against get_rays in tests/test_consistency.py).
    dirs_cam = jnp.stack(
        [
            (x - K[0, 2]) / K[0, 0],
            -(y - K[1, 2]) / K[1, 1],
            -jnp.ones_like(x),
        ],
        -1,
    )
    rays_d = dirs_cam @ ref_pose[:3, :3].T
    rays_o = jnp.broadcast_to(ref_pose[:3, 3], rays_d.shape)

    return {
        "origins": rays_o,
        "directions": rays_d,
        "rgb_target": rgb_ref,
        "depth_target": depth_ref,
        "weight": weight,
    }


def online_reprojection_loss(
    model,
    params,
    rng,
    batch: Dict[str, jnp.ndarray],
    cfg,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The ss_loss term: render reference rays and supervise them.

    batch must carry 'ref_image' [H, W, 3], 'ref_depth' [H, W],
    'ref_pose' [3, 4], 'K' [3, 3] in addition to the usual ray fields.
    Returns (loss, aux) — aux carries the consistency weight so the caller
    can gate its main losses (the reference's random 50% gating).
    """
    points_w = (
        batch["origins"] + batch["depth"][..., None] * batch["directions"]
    )
    ref = build_ref_rays(
        points_w,
        batch["ref_pose"],
        batch["ref_image"],
        batch["ref_depth"],
        batch["K"],
        cfg.occlusion_threshold,
        use_occlusion=True,
    )

    d = ref["directions"]
    ones = jnp.ones_like(d[..., :1])
    rays = Rays(
        origins=ref["origins"],
        directions=d,
        viewdirs=d / jnp.linalg.norm(d, axis=-1, keepdims=True),
        radii=ones * 1e-3,
        lossmult=ones,
        near=ones * cfg.near,
        far=ones * cfg.far,
    )
    # `model` may be a flax module or a bare apply_fn(params, rng, rays)
    # (the fused train step passes its kernel-backed forward).
    apply_fn = model.apply if hasattr(model, "apply") else model
    outputs = apply_fn(params, rng, rays)

    w = ref["weight"]
    loss = mask_losses.masked_mse(outputs["rgb"], ref["rgb_target"], w)
    if cfg.with_depth_loss:
        loss = loss + mask_losses.masked_mse(
            outputs["depth"], ref["depth_target"], w
        )
    if "rgb0" in outputs:
        loss = loss + mask_losses.masked_mse(
            outputs["rgb0"], ref["rgb_target"], w
        )
        if cfg.with_depth_loss:
            loss = loss + mask_losses.masked_mse(
                outputs["depth0"], ref["depth_target"], w
            )
    return loss, {"consistency_weight": w}
