"""Round-5 consistency ablation, consolidated into ONE TPU process.

The per-process queue (tpu_queue_r5a.sh) paid 20-30 min of device-grant
+ remote-compile latency per leg; this driver holds one grant and runs
every remaining arm sequentially, reusing the in-process jit cache where
programs repeat. Results append to tools/runs/logs_r5/ablate_results.txt
as one line per arm; fold them into RUNS_r5.md.

Usage: python tools/runs/ablate_r5.py [arm ...]   (default: all remaining)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "logs_r5", "ablate_results.txt")

A = dict(hardmask=False, with_depth_loss=False, n_patches=0)
B = dict(with_depth_loss=False, n_patches=0)
C = dict(n_patches=0)
D = {}
TAIL = dict(synthetic_interleave_test=False)
SPARSE = dict(synthetic_views=8, synthetic_n_test=4,
              synthetic_interleave_test=False)

# The paper's mechanism targets FEW-view interpolation on non-trivial
# geometry (3-view DTU): few train views spread over the orbit, test
# between them, occluded multi-object scene. "clu6" is that regime on
# the analytic cluster layout (4 train views, flagship capacity — the
# round-4 memorization axis); "clu16_tail" the extrapolation variant.
CLU6 = dict(synthetic_layout="cluster", synthetic_views=6,
            synthetic_n_test=2, synthetic_interleave_test=True)
CLU16T = dict(synthetic_layout="cluster", synthetic_interleave_test=False)
# Few-view INTERPOLATION — the paper's core regime (3-view DTU,
# README.md:24): 4 train views spread over the orbit, 4 test views
# between them, simple geometry so PSNR is not floor-bound (clu6 was).
FEW8I = dict(synthetic_views=8, synthetic_n_test=4,
             synthetic_interleave_test=True)
# Right-sized capacity for few-view scenes (round-4 queue F axis).
CAP128 = dict(netdepth=4, netwidth=128)

ARMS = {
    # Rerun: the shell queue's abl_a_int passed `hardmask=False` as the
    # truthy STRING "False" (coercion bug, fixed in configs._coerce), so
    # its recorded number was actually arm c. This entry is the genuine
    # vanilla-only interleaved arm.
    "abl_a_int": A,
    "abl_a_tail": {**A, **TAIL},
    "abl_d_tail": {**D, **TAIL},
    "abl_b_tail": {**B, **TAIL},
    "abl_c_tail": {**C, **TAIL},
    "abl_b_int": B,
    "abl_c_int": C,
    "abl_a_sparse": {**A, **SPARSE},
    "abl_b_sparse": {**B, **SPARSE},
    "abl_c_sparse": {**C, **SPARSE},
    "abl_d_sparse": {**D, **SPARSE},
    "abl_a_clu6": {**A, **CLU6},
    "abl_b_clu6": {**B, **CLU6},
    "abl_c_clu6": {**C, **CLU6},
    "abl_d_clu6": {**D, **CLU6},
    "abl_a_clu16_tail": {**A, **CLU16T},
    "abl_b_clu16_tail": {**B, **CLU16T},
    "abl_c_clu16_tail": {**C, **CLU16T},
    "abl_d_clu16_tail": {**D, **CLU16T},
    "abl_a_few8int": {**A, **FEW8I},
    "abl_b_few8int": {**B, **FEW8I},
    "abl_c_few8int": {**C, **FEW8I},
    "abl_d_few8int": {**D, **FEW8I},
    # Capacity-matched sparse arms: round-4 queue F showed the 8x256
    # flagship memorizes few-view scenes while 4x128 generalizes. If the
    # sparse-split win (c 12.80 vs a 8.92 at 8x256) persists at the
    # right-sized capacity, the method's value is not a capacity
    # artifact; if the margin grows, capacity was masking it.
    "abl_a_sparse_cap": {**A, **SPARSE, **CAP128},
    "abl_c_sparse_cap": {**C, **SPARSE, **CAP128},
    "abl_d_sparse_cap": {**D, **SPARSE, **CAP128},
    "abl_a_few8int_cap": {**A, **FEW8I, **CAP128},
    "abl_c_few8int_cap": {**C, **FEW8I, **CAP128},
    # Cluster-sparse: the one-sided split on the OCCLUDED multi-object
    # layout, at both capacities. The sphere's sparse-cap reversal
    # (a_cap 16.49 > c_cap 12.13) says right-sizing beats the prior when
    # the geometry is trivial; if the prior wins here at 4x128 too, the
    # method's value is geometry-complexity-, not capacity-, bound.
    "abl_a_cluspar": {**A, **SPARSE, "synthetic_layout": "cluster"},
    "abl_c_cluspar": {**C, **SPARSE, "synthetic_layout": "cluster"},
    "abl_a_cluspar_cap": {**A, **SPARSE, **CAP128,
                          "synthetic_layout": "cluster"},
    "abl_c_cluspar_cap": {**C, **SPARSE, **CAP128,
                          "synthetic_layout": "cluster"},
}


class _Args:
    config = None
    overrides = []
    num_steps = None


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def record(line):
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")
    log(line)


def run_vanilla_arm(name, overrides, num_steps=8000):
    import jax

    from consistentnerf_tpu.cli import common
    from consistentnerf_tpu.configs import scenes
    from consistentnerf_tpu.data.loaders import load_scene
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train.evaluation import evaluate

    cfg = scenes.get_scene_config("synthetic_pol").replace(
        basedir=f"/tmp/r5_{name}", expname=name, i_print=1000,
        checkpoint_every=10**9, use_tensorboard=False,
        eval_disable_lpips=True, **overrides,
    )
    cfg = common.auto_fused_defaults(cfg, _Args())
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    scene = load_scene(cfg)
    log(f"{name}: scene ready (train {len(scene.i_train)} / "
        f"test {len(scene.i_test)}), training {num_steps}")
    t0 = time.time()
    result = loop_lib.train(cfg, scene, num_steps=num_steps, log_fn=log)
    train_secs = time.time() - t0
    model = make_model(cfg)
    t0 = time.time()
    metrics = evaluate(
        model, cfg, result.state.params, scene,
        out_dir=os.path.join(cfg.basedir, cfg.expname, "test_preds"),
        save_images=False, step=num_steps,
    )
    record(
        f"{name}: psnr={metrics['psnr']:.4f} ssim={metrics['ssim']:.4f} "
        f"census={metrics.get('census_err', float('nan')):.4f} "
        f"train_rays_s={result.rays_per_sec:,.0f} "
        f"eval_rays_s={metrics.get('eval_rays_per_sec', 0):,.0f} "
        f"train_wall={train_secs:.0f}s eval_wall={time.time()-t0:.0f}s"
    )


def run_mip_pol(num_steps=8000, overrides=None, name="pol_mip_8k"):
    import jax

    from consistentnerf_tpu.cli import common
    from consistentnerf_tpu.configs import scenes
    from consistentnerf_tpu.data.loaders import load_scene
    from consistentnerf_tpu.data.random_poses import generate_random_poses
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train.evaluation import evaluate

    cfg = scenes.get_scene_config("synthetic_pol_mip").replace(
        basedir=f"/tmp/r5_{name}", expname=name, i_print=250,
        checkpoint_every=10**9, use_tensorboard=False,
        eval_disable_lpips=True, total_iters=num_steps,
        anneal_nearfar_steps=256, **(overrides or {}),
    )
    cfg = common.auto_fused_defaults(cfg, _Args())
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    scene = load_scene(cfg)
    random_poses = generate_random_poses(
        scene.poses[scene.i_train], n_poses=cfg.n_random_poses,
        pose_type=cfg.random_pose_type, radius=cfg.random_pose_radius,
        focusptjitter=cfg.random_pose_focusptjitter,
        add_test_poses=cfg.random_pose_add_test_poses,
        test_poses=scene.poses[scene.i_test],
    )
    log(f"{name}: training {num_steps} (regnerf3 recipe, anneal 256, "
        f"overrides={overrides or {}})")
    t0 = time.time()
    result = loop_lib.train(cfg, scene, num_steps=num_steps,
                            random_poses=random_poses, log_fn=log)
    train_secs = time.time() - t0
    model = make_model(cfg)
    metrics = evaluate(
        model, cfg, result.state.params, scene,
        out_dir=os.path.join(cfg.basedir, cfg.expname, "test_preds"),
        save_images=False, step=num_steps,
    )
    record(
        f"{name}: psnr={metrics['psnr']:.4f} ssim={metrics['ssim']:.4f} "
        f"census={metrics.get('census_err', float('nan')):.4f} "
        f"train_rays_s={result.rays_per_sec:,.0f} "
        f"eval_rays_s={metrics.get('eval_rays_per_sec', 0):,.0f} "
        f"train_wall={train_secs:.0f}s"
    )


# Mip-backbone consistency ablation (the grid above is vanilla-backbone;
# the reference's RegNeRF side carries the same masked depth supervision
# at RegNeRF/train.py:97-241). Arm a strips every consistency term but
# keeps the backbone's own TV geometry regularizer (that's RegNeRF's
# baseline, not ConsistentNeRF's contribution); arm c is the preset
# default (hardmask + masked depth prior).
MIP_OFF = dict(use_hardmask=False, compute_depth_metrics=False,
               compute_mono_depth_metrics=False)
MIP_ARMS = {
    "mip_a_sparse": {**MIP_OFF, **SPARSE},
    "mip_c_sparse": {**SPARSE},
    "mip_a_int": dict(MIP_OFF),
    # mip_c_int == the committed pol_mip_8k_lr1e3 run (26.71/0.943).
}


# Mip early-oscillation probes (VERDICT item 2): reproduce the FAILING
# regime — the 8k lr horizon keeps lr ~4x hotter through the step
# 500-1500 instability window than the converged 3k run (TV-norm start
# weight and lr warmup both end by step 512 regardless of horizon, so
# the horizon's only lever is how fast lr cools). 2k steps at the 8k
# horizon shows the collapse by step ~1000 (measured: psnr 3.65 @1000 in
# pol_mip_8k); each probe flips ONE axis.
MIP_PROBES = {
    "m_base": {},                              # J-style control: diverges
    "m_lr1e3": dict(lr_init=1e-3),             # halve the lr peak
    "m_tv40": dict(depth_tvnorm_loss_mult_start=40.0),  # 10x softer TV start
    "m_nonoise": dict(density_noise=0.0),      # kill the logit noise
    "m_delay2k": dict(lr_delay_steps=2048),    # 4x longer lr warmup
}


def run_mip_probe(name, overrides, num_steps=2000, total_iters=8000):
    import jax

    from consistentnerf_tpu.cli import common
    from consistentnerf_tpu.configs import scenes
    from consistentnerf_tpu.data.loaders import load_scene
    from consistentnerf_tpu.data.random_poses import generate_random_poses
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train.evaluation import evaluate

    cfg = scenes.get_scene_config("synthetic_pol_mip").replace(
        basedir=f"/tmp/r5_{name}", expname=name, i_print=250,
        checkpoint_every=10**9, use_tensorboard=False,
        eval_disable_lpips=True, total_iters=total_iters,
        anneal_nearfar_steps=256, **overrides,
    )
    cfg = common.auto_fused_defaults(cfg, _Args())
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    scene = load_scene(cfg)
    random_poses = generate_random_poses(
        scene.poses[scene.i_train], n_poses=cfg.n_random_poses,
        pose_type=cfg.random_pose_type, radius=cfg.random_pose_radius,
        focusptjitter=cfg.random_pose_focusptjitter,
        add_test_poses=cfg.random_pose_add_test_poses,
        test_poses=scene.poses[scene.i_test],
    )
    log(f"{name}: mip probe {overrides} steps={num_steps}/{total_iters}")
    t0 = time.time()
    result = loop_lib.train(cfg, scene, num_steps=num_steps,
                            random_poses=random_poses, log_fn=log)
    train_secs = time.time() - t0
    model = make_model(cfg)
    metrics = evaluate(
        model, cfg, result.state.params, scene,
        out_dir=os.path.join(cfg.basedir, cfg.expname, "test_preds"),
        save_images=False, step=num_steps,
    )
    record(
        f"{name}: psnr={metrics['psnr']:.4f} ssim={metrics['ssim']:.4f} "
        f"(probe @{num_steps}/{total_iters}) "
        f"train_rays_s={result.rays_per_sec:,.0f} wall={train_secs:.0f}s"
    )


def run_eval_sweep():
    """VERDICT item 6: eval_rays_per_sec vs eval_views_per_call at POL
    scale (128px), same trained-free throughput measurement for g=1
    (round-4 per-view semantics) vs the stacked g=2/4 dispatch."""
    import jax

    from consistentnerf_tpu.cli import common
    from consistentnerf_tpu.configs import scenes
    from consistentnerf_tpu.data.loaders import load_scene
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train.evaluation import evaluate

    cfg0 = scenes.get_scene_config("synthetic_pol").replace(
        basedir="/tmp/r5_evalsweep", expname="evsweep",
        synthetic_n_test=8, use_tensorboard=False,
        eval_disable_lpips=True, eval_save_output=False,
    )
    cfg0 = common.auto_fused_defaults(cfg0, _Args())
    scene = load_scene(cfg0)
    model = make_model(cfg0)
    batcher = loop_lib.make_batcher(scene, cfg0)
    state = loop_lib.init_state(cfg0, model, batcher.next_batch())
    for g in (1, 2, 4):
        cfg = cfg0.replace(eval_views_per_call=g)
        metrics = evaluate(model, cfg, state.params, scene,
                           out_dir=None, save_images=False, step=0)
        record(f"evalsweep_g{g}: eval_rays_s="
               f"{metrics.get('eval_rays_per_sec', 0):,.0f} "
               f"(8 views @128px, random init)")


def main():
    wanted = sys.argv[1:] or (list(ARMS) + ["pol_mip_8k"])
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log(f"devices: {jax.devices()}")
    for name in wanted:
        try:
            if name == "pol_mip_8k":
                run_mip_pol()
            elif name == "pol_mip_8k_lr1e3":
                # The fix the one-axis probes isolated: halving the lr
                # peak (m_lr1e3 read 25.23/0.925 at 2k of the 8k
                # horizon while the 2e-3 control collapsed to 7.78).
                run_mip_pol(overrides=dict(lr_init=1e-3), name=name)
            elif name == "pol_van_50k":
                # The reference's FULL vanilla schedule length
                # (run_nerf_view.py total_iters=50001) on the flagship
                # config — ~40 min at the one-pass rate.
                run_vanilla_arm(name, dict(total_iters=50000),
                                num_steps=50000)
            elif name == "pol_mip_50k":
                # The grid's native lr_init=2e-3 at its DESIGNED horizon
                # (50k, regnerf3 gin files) — validates §1b's diagnosis
                # that 2e-3 only diverges on short horizons.
                run_mip_pol(num_steps=50000,
                            overrides=dict(lr_init=2e-3), name=name)
            elif name == "evalsweep":
                run_eval_sweep()
            elif name in MIP_ARMS:
                run_mip_pol(overrides=MIP_ARMS[name], name=name)
            elif name in MIP_PROBES:
                run_mip_probe(name, MIP_PROBES[name])
            else:
                run_vanilla_arm(name, ARMS[name])
        except Exception as e:  # noqa: BLE001 — record and continue
            record(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
