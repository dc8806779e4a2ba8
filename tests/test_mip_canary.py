"""Mip/RegNeRF-backbone held-out generalization canary + schedule sanity.

Round 4's mip POL diverged on hardware from a mis-configured schedule
(`--num-steps 3000` against the 50k default `total_iters`: lr pinned at
lr_init, near/far anneal squeezed to mid-depth for 2/3 of training —
RUNS_r4.md §10, queue J, final PSNR 7.78). The divergence does NOT
reproduce at CPU toy scale (measured: J-style and healthy schedules both
read ~12.5 held-out PSNR at 500 steps), so this canary asserts two
complementary things:

1. held-out PSNR of the full regnerf3-style recipe (TV-norm random-pose
   patches, near/far anneal, hard masks, density noise) on the
   interleaved split — the quality canary the vanilla backbone already
   has (`test_generalization_canary.py`);
2. schedule sanity — the lr actually decays across the run and the
   near/far anneal fully opens by the end. The J-style config FAILS
   these predicates and `cli.common.reconcile_schedule_horizon` repairs
   it (the config-layer fix for the footgun).
"""

import numpy as np

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.data import random_poses as rp
from consistentnerf_tpu.data import synthetic
from consistentnerf_tpu.data.random_poses import generate_random_poses
from consistentnerf_tpu.models.factory import make_model
from consistentnerf_tpu.train import loop as loop_lib
from consistentnerf_tpu.train import render as render_lib
from consistentnerf_tpu.train.evaluation import camera_rays_for_view
from consistentnerf_tpu.train.state import make_lr_schedule

STEPS = 500


def mip_recipe_cfg(**kw) -> Config:
    """regnerf3-style recipe at CPU scale (cf. scenes.synthetic_pol_mip)."""
    base = dict(
        backbone="mipnerf", dataset_type="blender",
        netdepth=2, netwidth=48,
        mip_num_samples=12, mip_num_levels=2, max_deg_point=6,
        disable_normals=True,
        N_rand=192, batch_size_random=256, random_patch_size=8,
        load_random_rays=True,
        depth_tvnorm_loss_mult=0.1, depth_tvnorm_decay=True,
        depth_tvnorm_maxstep=64, depth_tvnorm_loss_mult_start=400.0,
        depth_tvnorm_loss_mult_end=0.1,
        use_hardmask=True, white_bkgd=True, near=2.0, far=6.0,
        anneal_nearfar=True, anneal_nearfar_steps=64,
        anneal_nearfar_perc=0.0001, anneal_mid_perc=1.0,
        lr_init=2e-3, lr_final=2e-5, lr_delay_steps=32, lr_delay_mult=0.01,
        grad_max_norm=0.1, grad_max_val=0.1, density_noise=1.0,
        total_iters=STEPS,
        use_tensorboard=False, checkpoint_every=10**9,
        basedir="/tmp/cnerf_test_logs", expname="mip_canary",
    )
    base.update(kw)
    return Config(**base)


def schedule_is_sane(cfg, num_steps: int) -> bool:
    """lr decays across the run AND the near/far anneal fully opens."""
    sched = make_lr_schedule(cfg)
    peak = max(float(sched(s)) for s in
               range(0, num_steps, max(1, num_steps // 50)))
    decayed = float(sched(num_steps - 1)) <= 0.05 * peak
    near_end, far_end = rp.anneal_nearfar_values(
        num_steps - 1, cfg.near, cfg.far, cfg.anneal_nearfar_steps,
        cfg.anneal_nearfar_perc, cfg.anneal_mid_perc,
    ) if cfg.anneal_nearfar else (cfg.near, cfg.far)
    opened = (abs(near_end - cfg.near) < 1e-6
              and abs(far_end - cfg.far) < 1e-6)
    return decayed and opened


def test_mip_heldout_psnr_canary():
    cfg = mip_recipe_cfg()
    assert schedule_is_sane(cfg, STEPS)

    scene = synthetic.make_scene(n_views=8, H=48, W=48).to_scene_data(
        n_test=2, interleave_test=True
    )
    random_poses = generate_random_poses(
        scene.poses[scene.i_train], n_poses=100
    )
    result = loop_lib.train(cfg, scene, num_steps=STEPS,
                            random_poses=random_poses,
                            use_prefetch=False, log_fn=lambda s: None)

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
    # Calibrated on the healthy recipe: [12.3, 12.8] at 500 steps (CPU,
    # deterministic seed). Collapse reads <= ~10.
    assert min(psnrs) > 11.0, f"mip held-out generalization collapsed: {psnrs}"
    assert float(np.mean(psnrs)) > 11.5, f"mip held-out PSNR too low: {psnrs}"


def test_j_style_schedule_fails_sanity_and_reconcile_repairs_it():
    """The queue-J config class: short run against the long default
    horizon + default anneal. The sanity predicate must flag it, and the
    CLI-layer reconciliation must repair it."""
    from consistentnerf_tpu.cli import common

    j_cfg = mip_recipe_cfg(
        total_iters=50000,            # the 50k default horizon
        anneal_nearfar_steps=2000,    # default anneal length
        anneal_nearfar_perc=0.2, anneal_mid_perc=0.5,
    )
    assert not schedule_is_sane(j_cfg, 500)

    class _Args:
        config = None
        overrides = []
        num_steps = 500

    fixed = common.reconcile_schedule_horizon(j_cfg, _Args())
    assert fixed.total_iters == 500
    assert schedule_is_sane(fixed, 500)
