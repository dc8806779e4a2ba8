"""Blind-prior rescue of the sparse split — the full reference pipeline
with NO ground truth anywhere.

RUNS_r5.md §1 proved the method with INFORMATIVE priors (the synthetic
scene's analytic GT depth): sparse one-sided split collapses at 8.92
PSNR vanilla, rescued to 12.80 by the masked depth prior. The reference
never had GT depth either — its priors come from an external pretrained
MVSNeRF (renderer-copy.ipynb PFMs consumed at load_blender.py:130-223).
This run closes that loop on hardware: produce the priors IN-FRAMEWORK
from the 4 photo-only train views (GT stripped before the producer runs)
and ask whether the consistent retrain still rescues the collapse.

Arms (sparse split: 8 views, last 4 held out — 4 one-sided train views;
retrain = arm-c losses, hardmask + masked depth prior, 8k steps):
  boot_warmup_sparse  producer = prior-free warmup NeRF (RUNS §5 predicts
                      garbage-in: the warmup itself collapses here)
  boot_mvs_sparse     producer = plane-sweep MVS net, photometric
                      self-supervised (models/mvs.py) — cross-view
                      matching is independent of any NeRF's geometry

Records prior depth-MSE vs the (held-back) GT, mask coverage, and
held-out PSNR/SSIM after the retrain, appended to ablate_results.txt.

Usage: python tools/runs/boot_sparse_r5.py [arm ...] [--producer-steps N]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "logs_r5", "ablate_results.txt")

SPARSE = dict(synthetic_views=8, synthetic_n_test=4,
              synthetic_interleave_test=False)


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


TINY = dict(  # CPU smoke of the full flow (--tiny)
    synthetic_hw=48, netdepth=2, netwidth=32, N_samples=16,
    N_importance=8, multires=4, multires_views=2, N_rand=192,
    compute_dtype="float32", mvs_num_depths=16, mvs_base_ch=8,
)


def run_arm(mode, producer_steps=2000, retrain_steps=8000, tiny=False):
    import numpy as np

    from consistentnerf_tpu.cli import common
    from consistentnerf_tpu.configs import scenes
    from consistentnerf_tpu.data.loaders import load_scene
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train.bootstrap import bootstrap_scene_priors
    from consistentnerf_tpu.train.evaluation import evaluate

    name = f"boot_{mode}_sparse" + ("_tiny" if tiny else "")
    cfg = scenes.get_scene_config("synthetic_pol").replace(
        basedir=f"/tmp/r5_{name}", expname=name, i_print=1000,
        checkpoint_every=10**9, use_tensorboard=False,
        eval_disable_lpips=True, n_patches=0,  # arm-c loss family
        bootstrap_mode=mode, mvs_n_src=2, **SPARSE, **(TINY if tiny else {}),
    )
    if tiny:
        cfg = cfg.replace(total_iters=retrain_steps)
    cfg = common.auto_fused_defaults(cfg, _Args())
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    scene = load_scene(cfg)
    tr = np.asarray(scene.i_train)
    gt_depth = scene.depths.copy()  # held back for METRICS only

    # The producers run blind — a real photo-only capture.
    shape = scene.images.shape[:3]
    blind = dataclasses.replace(
        scene,
        depths=np.zeros(shape, np.float32),
        masks=np.ones(shape, np.float32),
        depth_is_gt=False,
    )
    log(f"{name}: producer={mode} steps={producer_steps} "
        f"(train {len(scene.i_train)} / test {len(scene.i_test)}, blind)")
    t0 = time.time()
    boot, _ = bootstrap_scene_priors(cfg, blind, producer_steps, log_fn=log)
    prod_secs = time.time() - t0

    m = (boot.depths[tr] > 0) & (gt_depth[tr] > 0) \
        & np.isfinite(boot.depths[tr])
    prior_mse = (float(np.mean((boot.depths[tr][m] - gt_depth[tr][m]) ** 2))
                 if m.any() else float("nan"))
    cov = float(np.mean(boot.masks[tr]))
    prior_cov = float(np.mean(boot.depths[tr] > 0))
    log(f"{name}: prior depthMSE={prior_mse:.4f} depth_cov={prior_cov:.3f} "
        f"mask_cov={cov:.3f} producer_wall={prod_secs:.0f}s")

    t0 = time.time()
    result = loop_lib.train(cfg, boot, num_steps=retrain_steps, log_fn=log)
    train_secs = time.time() - t0
    model = make_model(cfg)
    metrics = evaluate(
        model, cfg, result.state.params, scene,
        out_dir=os.path.join(cfg.basedir, cfg.expname, "test_preds"),
        save_images=False, step=retrain_steps,
    )
    record(
        f"{name}: psnr={metrics['psnr']:.4f} ssim={metrics['ssim']:.4f} "
        f"census={metrics.get('census_err', float('nan')):.4f} "
        f"prior_mse={prior_mse:.4f} prior_cov={prior_cov:.3f} "
        f"mask_cov={cov:.3f} "
        f"train_rays_s={result.rays_per_sec:,.0f} "
        f"producer_wall={prod_secs:.0f}s train_wall={train_secs:.0f}s"
    )


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tiny = "--tiny" in sys.argv
    psteps, rsteps = 2000, 8000
    for a in sys.argv[1:]:
        if a.startswith("--producer-steps="):
            psteps = int(a.split("=")[1])
        if a.startswith("--retrain-steps="):
            rsteps = int(a.split("=")[1])
    wanted = args or ["mvs", "warmup"]
    import jax

    if tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log(f"devices: {jax.devices()}")
    for mode in wanted:
        try:
            run_arm(mode, producer_steps=psteps, retrain_steps=rsteps,
                    tiny=tiny)
        except Exception as e:  # noqa: BLE001 — record and continue
            record(f"boot_{mode}_sparse: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
