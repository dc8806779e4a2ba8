"""Two-stage depth-prior bootstrap: warmup NeRF -> depth -> masks -> retrain.

The reference bootstraps its consistency priors from an *external*
pretrained MVSNeRF run (`renderer-copy.ipynb` writing
`nerf_*_data_depth/.../depth_%04d.pfm`), which is a chicken-and-egg on a
fresh scene without that checkpoint. This module provides the in-framework
equivalent:

1. warmup: train the plain backbone on the sparse views with every
   consistency term disabled (vanilla-NeRF loss only),
2. render the warmup model's expected-depth for each training view —
   these become the "MVS" depth priors,
3. generate hard masks on-device from those priors
   (`consistency/reproject.py`, the run_nerf_view.py:994-1055 algorithm),
4. return a scene carrying the new priors for the consistent retrain.

NDC scenes are excluded: the renderer's depth is an NDC-space distance
there, while the reprojection lift needs metric depth along the ray.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional, Tuple

import jax
import numpy as np

from consistentnerf_tpu.consistency import reproject


def warmup_config(cfg, warmup_steps: int):
    """The stage-1 config: same model/optics, all consistency terms off."""
    return dataclasses.replace(
        cfg,
        expname=cfg.expname + "_warmup",
        total_iters=warmup_steps,
        hardmask=False,
        softmask=False,
        softLpmask=False,
        with_depth_loss=False,
        use_test_pseudo_label=False,
        ss_loss=False,
        mono_depth_loss_mult=0.0,
        patch_ssim_loss_mult=0.0,
        patch_lpips_loss_mult=0.0,
        train_render_every=0,
    )


def render_warmup_depths(warm_cfg, scene, params) -> np.ndarray:
    """Expected-termination depth of each train view under `params`,
    zeroed where the ray saw nothing (acc ~ 0 background) so the masks
    treat it as "no prior" — matching the MVS PFMs' zero-depth
    background convention."""
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import render as render_lib
    from consistentnerf_tpu.train.evaluation import camera_rays_for_view

    model = make_model(warm_cfg)
    render = render_lib.build_render_fn(model, warm_cfg, params)
    depths = np.zeros(scene.images.shape[:3], np.float32)
    for vid in np.asarray(scene.i_train):
        rays = camera_rays_for_view(scene, scene.poses[vid])
        out = render(rays)
        acc = np.asarray(out["acc"])
        depths[vid] = np.asarray(out["depth"]) * (acc > 0.5)
    return depths


def bootstrap_scene_priors(
    cfg,
    scene,
    warmup_steps: int,
    log_fn: Callable[[str], None] = print,
    export_dir: Optional[str] = None,
    use_prefetch: bool = True,
) -> Tuple[object, object]:
    """Run the producer stage and return (scene_with_priors, stage_result).

    The producer is selected by `cfg.bootstrap_mode`: "warmup" (stage-1
    NeRF, depths rendered from it) or "mvs" (the in-framework plane-sweep
    MVS network, `models/mvs.py` — the analog of the reference's external
    pretrained-MVSNeRF notebook producer). `warmup_steps` is the step
    budget of either producer. When `export_dir` is set, the priors are
    also written in the reference's on-disk layout (depth_%04d.pfm +
    mask JPGs) so they can be reused by make_masks / external tooling.
    """
    if scene.use_ndc:
        raise ValueError(
            "bootstrap priors need metric depth; NDC (forward-facing "
            "LLFF) scenes are not supported — train with spherify or "
            "provide external priors"
        )
    mode = getattr(cfg, "bootstrap_mode", "warmup")
    if mode == "mvs":
        from consistentnerf_tpu.train import mvs as mvs_train

        # The MVS producer must not peek at priors that may already ride
        # on the scene — only GT-quality depth supervises (the loaders
        # put MVS priors in `depths`; a scene with real GT depth — DTU,
        # synthetic — supervises, anything else self-supervises).
        result = mvs_train.train_mvs_depth(
            cfg, scene, num_steps=warmup_steps, log_fn=log_fn
        )
        depths = mvs_train.predict_depth_priors(cfg, scene, result.params)
    elif mode == "warmup":
        from consistentnerf_tpu.train import loop as loop_lib

        warm_cfg = warmup_config(cfg, warmup_steps)
        # The warmup trains on a prior-free copy (unit masks, zero depths).
        shape = scene.images.shape[:3]
        warm_scene = dataclasses.replace(
            scene,
            depths=np.zeros(shape, np.float32),
            masks=np.ones(shape, np.float32),
        )
        log_fn(f"bootstrap: warmup training {warmup_steps} steps "
               f"({warm_cfg.expname})")
        result = loop_lib.train(
            warm_cfg, warm_scene, num_steps=warmup_steps, log_fn=log_fn,
            use_prefetch=use_prefetch,
        )

        params = jax.device_get(result.state).params
        depths = render_warmup_depths(warm_cfg, scene, params)
    else:
        raise ValueError(
            f"Unknown bootstrap_mode {mode!r} (expected 'warmup' or 'mvs')"
        )

    if getattr(cfg, "bootstrap_fuse_priors", True):
        # Cross-view occlusion-tested consensus (the reference's mask-
        # time geometric test, applied at prior time): keeps only depths
        # other views confirm and averages the agreeing estimates —
        # measured to cut prior depth-MSE vs raw warmup depth
        # (tests/test_bootstrap.py::test_fused_priors_beat_raw_warmup).
        log_fn("bootstrap: cross-view consensus fusion of warmup depths")
        depths = reproject.fuse_depth_priors(
            scene.poses, depths, scene.K, scene.i_train, scene.H,
            scene.W, threshold=cfg.occlusion_threshold,
            min_consensus=getattr(cfg, "bootstrap_fuse_min_consensus", 1),
        )

    log_fn("bootstrap: generating hard masks from warmup depths")
    masks = reproject.compute_hard_masks(
        scene.poses, depths, scene.K, scene.i_train, scene.H, scene.W,
        occlusion_threshold=cfg.occlusion_threshold,
    ).astype(np.float32)

    if export_dir:
        os.makedirs(export_dir, exist_ok=True)
        from consistentnerf_tpu.data.pfm import write_pfm

        import imageio.v2 as imageio

        for vid in np.asarray(scene.i_train):
            write_pfm(
                os.path.join(export_dir, f"depth_{vid:04d}.pfm"),
                depths[vid],
            )
            imageio.imwrite(
                os.path.join(export_dir, f"{vid}_mask_boot.jpg"),
                (masks[vid] * 255).astype(np.uint8),
            )
        log_fn(f"bootstrap: exported priors to {export_dir}")

    boot_scene = dataclasses.replace(
        scene, depths=depths, masks=masks,
        depth_is_gt=False,  # produced priors, never ground truth
    )
    return boot_scene, result
