"""Depth-prior producer comparison: bootstrap_mode='warmup' vs 'mvs'.

Same scene, same budget (VERDICT r4 item 5): prior depth-MSE vs GT,
hard-mask coverage, and held-out quality after the consistent retrain.
Both producers run BLIND (the scene's GT depths/masks are stripped first
— a real photo-only capture). Reference role being replaced: the
external MVSNeRF prior producer (renderer-copy.ipynb) whose PFMs
load_blender.py:130-223 consumes.

Usage: python tools/compare_producers.py [producer_steps] [retrain_steps]
Committed reading (500/500, CPU, seed 0 — RUNS_r5.md):
  warmup: prior_depth_mse=0.0639 mask_cov=0.172 retrain depthMSE=0.1075 psnr=15.70
  mvs:    prior_depth_mse=0.0266 mask_cov=0.130 retrain depthMSE=0.0775 psnr=14.29
The MVS net's priors are ~2.4x more depth-accurate and retrain to better
held-out geometry; the warmup producer retains better held-out PSNR at
half the cost, so 'warmup' stays the default bootstrap_mode.
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.data import synthetic
from consistentnerf_tpu.models.factory import make_model
from consistentnerf_tpu.train import loop as loop_lib
from consistentnerf_tpu.train import render as render_lib
from consistentnerf_tpu.train.bootstrap import bootstrap_scene_priors
from consistentnerf_tpu.train.evaluation import camera_rays_for_view

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 500
RETRAIN = int(sys.argv[2]) if len(sys.argv) > 2 else 500


def heldout(model, cfg, params, scene):
    render = render_lib.build_render_fn(model, cfg, params)
    derr, psnr = [], []
    for vid in scene.i_test:
        out = render(camera_rays_for_view(scene, scene.poses[vid]))
        gt_d = scene.depths[vid]; m = gt_d > 0
        derr.append(float(np.mean((np.asarray(out["depth"])[m] - gt_d[m]) ** 2)))
        pred = np.clip(np.asarray(out["rgb"]), 0, 1)
        psnr.append(float(-10 * np.log10(np.mean((pred - scene.images[vid]) ** 2))))
    return float(np.mean(derr)), float(np.mean(psnr))


scene = synthetic.make_scene(n_views=6, H=48, W=48).to_scene_data(
    n_test=2, interleave_test=True)
gt_depth = scene.depths.copy()
tr = np.asarray(scene.i_train)

for mode in ("warmup", "mvs"):
    cfg = Config(
        backbone="vanilla", netdepth=2, netwidth=64, N_samples=16,
        N_importance=8, multires=4, multires_views=2, N_rand=192,
        n_patches=1, patch_size=8, white_bkgd=True, near=2.0, far=6.0,
        hardmask=True, with_depth_loss=True, use_tensorboard=False,
        i_print=10**6, checkpoint_every=10**6, total_iters=RETRAIN,
        lrate=5e-3, basedir="/tmp/calib_prod", expname=f"prod_{mode}",
        bootstrap_mode=mode, mvs_num_depths=16, mvs_base_ch=8,
        eval_disable_lpips=True, eval_save_output=False,
    )
    # The producers must not see the GT depths that ride on the synthetic
    # scene (provenance test is the point): strip them like a real
    # photo-only capture.
    import dataclasses
    blind = dataclasses.replace(
        scene,
        depths=np.zeros(scene.images.shape[:3], np.float32),
        masks=np.ones(scene.images.shape[:3], np.float32),
        depth_is_gt=False,
    )
    t0 = time.time()
    boot, _ = bootstrap_scene_priors(cfg, blind, STEPS,
                                     log_fn=lambda s: None,
                                     use_prefetch=False)
    m = (boot.depths[tr] > 0) & (gt_depth[tr] > 0)
    prior_mse = float(np.mean((boot.depths[tr][m] - gt_depth[tr][m]) ** 2))
    cov = float(np.mean(boot.masks[tr]))
    r = loop_lib.train(cfg, boot, num_steps=RETRAIN, use_prefetch=False,
                       log_fn=lambda s: None)
    model = make_model(cfg)
    d, p = heldout(model, cfg, jax.device_get(r.state).params, scene)
    print(f"{mode}: prior_depth_mse={prior_mse:.4f} mask_cov={cov:.3f} "
          f"retrain heldout depthMSE={d:.4f} psnr={p:.2f} "
          f"({time.time()-t0:.0f}s)", flush=True)
