"""Novel-view generalization canary.

The round-4 POL collapse (RUNS_r4.md §5: held-out PSNR 8-14 while train
PSNR read 36-42) was invisible to the suite: every e2e test asserted
TRAIN convergence only. This canary trains the full flagship loss family
(hard masks + depth prior + patch terms) on the interleaved split at a
CPU-sized scale and asserts HELD-OUT quality. The catastrophic class of
regression (loss/mask/prior semantics that fit train views without
consistent geometry) reads ~7-10 dB here; the healthy recipe reads ~14-16.
"""

import numpy as np

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.data import synthetic
from consistentnerf_tpu.data.loaders import attach_masks
from consistentnerf_tpu.models.factory import make_model
from consistentnerf_tpu.train import loop as loop_lib
from consistentnerf_tpu.train import render as render_lib
from consistentnerf_tpu.train.evaluation import camera_rays_for_view


def test_interleaved_heldout_psnr_canary():
    cfg = Config(
        dataset_type="synthetic", backbone="vanilla",
        netdepth=2, netwidth=64, netdepth_fine=2, netwidth_fine=64,
        multires=6, multires_views=2,
        N_samples=16, N_importance=16, N_rand=256,
        n_patches=1, patch_size=8,
        hardmask=True, with_depth_loss=True, white_bkgd=True,
        lrate=5e-3, use_tensorboard=False, checkpoint_every=10**9,
        basedir="/tmp/cnerf_test_logs", expname="canary",
    )
    scene = synthetic.make_scene(n_views=8, H=64, W=64).to_scene_data(
        n_test=2, interleave_test=True
    )
    scene = attach_masks(scene, cfg, None)
    result = loop_lib.train(cfg, scene, num_steps=800, use_prefetch=False,
                            log_fn=lambda s: None)

    model = make_model(cfg)
    render = render_lib.build_render_fn(model, cfg, result.state.params)
    psnrs = []
    for vid in scene.i_test:
        rays = camera_rays_for_view(scene, scene.poses[vid])
        pred = np.clip(
            np.asarray(render(rays)["rgb"]).reshape(scene.H, scene.W, 3),
            0, 1,
        )
        psnrs.append(float(
            -10 * np.log10(np.mean((pred - scene.images[vid]) ** 2))
        ))
    # Calibrated on the healthy recipe: [12.8, 15.1] at 800 steps (CPU,
    # deterministic seed). Collapse reads <= ~10 on every view.
    assert min(psnrs) > 11.0, f"held-out generalization collapsed: {psnrs}"
    assert float(np.mean(psnrs)) > 12.5, f"held-out PSNR too low: {psnrs}"


def _heldout_psnrs(cfg, scene, params):
    model = make_model(cfg)
    render = render_lib.build_render_fn(model, cfg, params)
    psnrs = []
    for vid in scene.i_test:
        rays = camera_rays_for_view(scene, scene.poses[vid])
        pred = np.clip(
            np.asarray(render(rays)["rgb"]).reshape(scene.H, scene.W, 3),
            0, 1,
        )
        psnrs.append(float(
            -10 * np.log10(np.mean((pred - scene.images[vid]) ** 2))
        ))
    return psnrs


def test_sparse_split_consistency_beats_vanilla():
    """The METHOD's direction, pinned at suite scale (VERDICT r4 item 1).

    Sparse one-sided split on the occluded cluster layout: 4 train views
    on one side of the orbit, 4 test views on the other — the regime the
    paper targets (run_nerf_view.py:994-1055 hard-mask losses exist to
    rescue exactly this). RGB-only training collapses here while the
    full consistency family stays coherent. Measured at these settings
    (CPU, seed 0, 800 steps): vanilla mean 7.29 (per-view max 8.7),
    flagship mean 10.96 (per-view min 10.4) — same ordering as the real
    v5e grid at production scale (RUNS_r5.md §1: 8.92 vs 12.01).
    """
    def arm_cfg(name, **loss_kw):
        return Config(
            dataset_type="synthetic", backbone="vanilla",
            netdepth=2, netwidth=64, netdepth_fine=2, netwidth_fine=64,
            multires=6, multires_views=2,
            N_samples=16, N_importance=16, N_rand=256,
            white_bkgd=True, lrate=5e-3, use_tensorboard=False,
            checkpoint_every=10**9, total_iters=800,
            basedir="/tmp/cnerf_test_logs", expname=f"sparse_{name}",
            **loss_kw,
        )

    scene = synthetic.make_scene(
        n_views=8, H=48, W=48, layout="cluster"
    ).to_scene_data(n_test=4, interleave_test=False)

    cfg_a = arm_cfg("a", hardmask=False, with_depth_loss=False,
                    n_patches=0)
    res_a = loop_lib.train(cfg_a, scene, num_steps=800,
                           use_prefetch=False, log_fn=lambda s: None)
    psnr_a = _heldout_psnrs(cfg_a, scene, res_a.state.params)

    cfg_d = arm_cfg("d", hardmask=True, with_depth_loss=True,
                    n_patches=1, patch_size=8)
    scene_d = attach_masks(scene, cfg_d, None)
    res_d = loop_lib.train(cfg_d, scene_d, num_steps=800,
                           use_prefetch=False, log_fn=lambda s: None)
    psnr_d = _heldout_psnrs(cfg_d, scene_d, res_d.state.params)

    a, d = float(np.mean(psnr_a)), float(np.mean(psnr_d))
    # Vanilla collapses in this regime (measured 7.29; anything above
    # ~9.5 means the scene stopped being sparse-hard).
    assert a < 9.5, f"vanilla no longer collapses here: {psnr_a}"
    # Consistency must WIN, not just survive (measured +3.67 dB).
    assert d > a + 1.5, f"consistency win lost: a={psnr_a} d={psnr_d}"
    assert min(psnr_d) > 9.0, f"flagship view floor: {psnr_d}"
