"""E2e test of the two-stage depth-prior bootstrap flow.

warmup NeRF -> render depth priors -> on-device hard masks -> consistent
retrain (train/bootstrap.py; replaces the reference's external MVSNeRF
producer, renderer-copy.ipynb).

Measured behavior at this tiny scale (CPU, ~350 steps each): the priors
are accurate in the masked region, and the retrain matches or improves
held-out GEOMETRY (depth MSE) while staying within a small PSNR band of
the warmup — the full quality win of the method belongs to the sparse
one-sided-view regime at production budgets (see CLAUDE.md
proof-of-life). This test pins the flow and its non-degradation.
"""

import os
import shutil

import jax
import numpy as np
import pytest

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.data import synthetic
from consistentnerf_tpu.models.factory import make_model
from consistentnerf_tpu.train import loop as loop_lib
from consistentnerf_tpu.train import render as render_lib
from consistentnerf_tpu.train.bootstrap import (
    bootstrap_scene_priors,
    warmup_config,
)
from consistentnerf_tpu.train.evaluation import camera_rays_for_view


def _heldout_metrics(model, cfg, params, scene):
    render = render_lib.build_render_fn(model, cfg, params)
    derr, psnr = [], []
    for vid in scene.i_test:
        rays = camera_rays_for_view(scene, scene.poses[vid])
        out = render(rays)
        gt_d = scene.depths[vid]
        m = gt_d > 0
        derr.append(
            float(np.mean((np.asarray(out["depth"])[m] - gt_d[m]) ** 2))
        )
        pred = np.clip(np.asarray(out["rgb"]), 0, 1)
        psnr.append(float(
            -10 * np.log10(np.mean((pred - scene.images[vid]) ** 2))
        ))
    return float(np.mean(derr)), float(np.mean(psnr))


def test_fused_priors_beat_raw_warmup_synthetic():
    """Cross-view consensus fusion (reproject.fuse_depth_priors) must cut
    prior depth-MSE vs the raw per-view depths it is fed: Gaussian noise
    averages down across agreeing views, and view-independent gross
    outliers fail the occlusion test and lose their prior entirely."""
    from consistentnerf_tpu.consistency import reproject

    scene = synthetic.make_scene(n_views=8, H=48, W=48).to_scene_data()
    gt = scene.depths
    rng = np.random.RandomState(0)
    # Simulated warmup error: fog noise everywhere + 5% gross outliers
    # (independent per view, so other views cannot confirm them).
    noisy = gt + (gt > 0) * rng.normal(0, 0.03, gt.shape)
    outliers = (rng.rand(*gt.shape) < 0.05) & (gt > 0)
    noisy = np.where(outliers, gt + rng.uniform(0.5, 1.5, gt.shape),
                     noisy).astype(np.float32)

    fused = reproject.fuse_depth_priors(
        scene.poses, noisy, scene.K, scene.i_train, scene.H, scene.W,
        threshold=0.1, min_consensus=1,
    )

    tr = np.asarray(scene.i_train)
    m_raw = (noisy[tr] > 0) & (gt[tr] > 0)
    m_fused = (fused[tr] > 0) & (gt[tr] > 0)
    mse_raw = float(np.mean((noisy[tr][m_raw] - gt[tr][m_raw]) ** 2))
    mse_fused = float(np.mean((fused[tr][m_fused] - gt[tr][m_fused]) ** 2))
    # Fusion must at least halve the prior error here (measured ~10x).
    assert mse_fused < 0.5 * mse_raw, (mse_fused, mse_raw)
    # Outlier pixels are overwhelmingly rejected...
    out_kept = float(np.mean(fused[tr][outliers[tr]] > 0))
    assert out_kept < 0.2, out_kept
    # ...while coverage of genuine prior pixels survives.
    cov = float(np.mean(fused[tr][m_raw & ~outliers[tr]] > 0))
    assert cov > 0.5, cov


def test_bootstrap_priors_end_to_end(tmp_path):
    # 500 steps: below ~400 the warmup is still foggy and the depth
    # priors are not yet meaningful (measured: 0.38 MSE at 350 steps vs
    # 0.04 at 500 on this scene).
    steps = 500
    scene = synthetic.make_scene(n_views=6, H=48, W=48).to_scene_data()
    cfg = Config(
        backbone="vanilla", netdepth=2, netwidth=64, N_samples=16,
        N_importance=8, multires=4, multires_views=2, N_rand=192,
        n_patches=1, patch_size=8, white_bkgd=True, near=2.0, far=6.0,
        hardmask=True, with_depth_loss=True, use_tensorboard=False,
        i_print=1000, checkpoint_every=100000, total_iters=steps,
        lrate=5e-3, basedir=str(tmp_path), expname="boot",
        eval_disable_lpips=True, eval_save_output=False,
    )
    export_dir = str(tmp_path / "priors")
    boot_scene, warm = bootstrap_scene_priors(
        cfg, scene, steps, log_fn=lambda s: None, export_dir=export_dir,
        use_prefetch=False,
    )

    tr = np.asarray(scene.i_train)
    # Priors exported in the reference's on-disk layout.
    assert os.path.isfile(
        os.path.join(export_dir, f"depth_{tr[0]:04d}.pfm")
    )
    # Masks are a plausible consistency subset, not degenerate.
    frac = float(boot_scene.masks[tr].mean())
    assert 0.02 < frac < 0.95, frac
    # Prior depth is accurate vs GT inside the masked region (synthetic
    # scene has exact depths).
    m = (boot_scene.masks[tr] > 0) & (scene.depths[tr] > 0)
    prior_mse = float(
        np.mean((boot_scene.depths[tr][m] - scene.depths[tr][m]) ** 2)
    )
    # Measured 0.044 at these settings; 0.2 leaves platform headroom
    # while still rejecting fog priors (those measure >1).
    assert prior_mse < 0.2, prior_mse

    # Consensus fusion must not make the REAL warmup priors worse, and
    # on prior-carrying pixels it should beat or match them (the big
    # wins show on outlier-contaminated depth — see the synthetic
    # corruption test; warmup depth at convergence is already smooth).
    from consistentnerf_tpu.consistency import reproject
    from consistentnerf_tpu.train.bootstrap import render_warmup_depths

    raw = render_warmup_depths(
        warmup_config(cfg, steps), scene,
        jax.device_get(warm.state).params,
    )
    fused = reproject.fuse_depth_priors(
        scene.poses, raw, scene.K, scene.i_train, scene.H, scene.W,
        threshold=cfg.occlusion_threshold,
    )
    m_raw = (raw[tr] > 0) & (scene.depths[tr] > 0)
    m_fu = (fused[tr] > 0) & (scene.depths[tr] > 0)
    mse_raw = float(np.mean((raw[tr][m_raw] - scene.depths[tr][m_raw]) ** 2))
    mse_fu = float(np.mean((fused[tr][m_fu] - scene.depths[tr][m_fu]) ** 2))
    assert mse_fu <= mse_raw * 1.05, (mse_fu, mse_raw)
    assert float(np.mean(m_fu)) > 0.3 * float(np.mean(m_raw))

    model = make_model(cfg)
    warm_params = jax.device_get(warm.state).params
    w_derr, w_psnr = _heldout_metrics(
        model, warmup_config(cfg, steps), warm_params, scene
    )

    result = loop_lib.train(cfg, boot_scene, num_steps=steps,
                            use_prefetch=False, log_fn=lambda s: None)
    b_derr, b_psnr = _heldout_metrics(
        model, cfg, jax.device_get(result.state).params, scene
    )

    # Consistent retrain must not degrade held-out geometry, and color
    # quality stays within a small band of the warmup.
    assert b_derr < w_derr * 1.3, (b_derr, w_derr)
    assert b_psnr > w_psnr - 2.5, (b_psnr, w_psnr)
    assert np.isfinite(b_psnr) and b_psnr > 8.0
