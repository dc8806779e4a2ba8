"""Bootstrap-on-sparse-splits probe (RUNS_r5.md §5).

Does the SELF-bootstrapped flow (warmup -> own depth priors -> consistent
retrain, train/bootstrap.py) IMPROVE held-out PSNR on sparse splits at
CPU scale? Measured answer: no, not reliably — deltas sit inside
+-0.5 dB, and in the collapse regime the priors inherit the collapsed
geometry. The method's sparse win needs informative priors (see the
hardware grid, RUNS_r5.md §1, and test_generalization_canary.py::
test_sparse_split_consistency_beats_vanilla).

Usage: python tools/runs/probe_boot_sparse.py   (CPU, ~7 min, seed 0)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from consistentnerf_tpu.configs import Config  # noqa: E402
from consistentnerf_tpu.data import synthetic  # noqa: E402
from consistentnerf_tpu.models.factory import make_model  # noqa: E402
from consistentnerf_tpu.train import loop as loop_lib  # noqa: E402
from consistentnerf_tpu.train.bootstrap import (  # noqa: E402
    bootstrap_scene_priors,
    warmup_config,
)

# (layout, n_views, n_test): collapse regime first, then two semi-sparse
# tail splits where the warmup converges.
SPLITS = [("cluster", 8, 4), ("sphere", 8, 2), ("cluster", 8, 2),
          ("sphere", 6, 2)]
STEPS = 800


def heldout_metrics(model, cfg, params, scene):
    from consistentnerf_tpu.train import render as render_lib
    from consistentnerf_tpu.train.evaluation import camera_rays_for_view

    render = render_lib.build_render_fn(model, cfg, params)
    derr, psnr = [], []
    for vid in scene.i_test:
        out = render(camera_rays_for_view(scene, scene.poses[vid]))
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


def main():
    for layout, nv, ntest in SPLITS:
        scene = synthetic.make_scene(
            n_views=nv, H=48, W=48, layout=layout
        ).to_scene_data(n_test=ntest, interleave_test=False)
        cfg = Config(
            backbone="vanilla", netdepth=2, netwidth=64, N_samples=16,
            N_importance=16, multires=6, multires_views=2, N_rand=256,
            n_patches=1, patch_size=8, white_bkgd=True, near=2.0, far=6.0,
            hardmask=True, with_depth_loss=True, use_tensorboard=False,
            i_print=10**9, checkpoint_every=10**9, total_iters=STEPS,
            lrate=5e-3, basedir="/tmp/probe_boot_sparse_logs",
            expname=f"bss_{layout}{nv}t{ntest}",
            eval_disable_lpips=True, eval_save_output=False,
        )
        t0 = time.time()
        boot_scene, warm = bootstrap_scene_priors(
            cfg, scene, STEPS, log_fn=lambda s: None, use_prefetch=False
        )
        model = make_model(cfg)
        w_derr, w_psnr = heldout_metrics(
            model, warmup_config(cfg, STEPS),
            jax.device_get(warm.state).params, scene,
        )
        result = loop_lib.train(cfg, boot_scene, num_steps=STEPS,
                                use_prefetch=False, log_fn=lambda s: None)
        b_derr, b_psnr = heldout_metrics(
            model, cfg, jax.device_get(result.state).params, scene,
        )
        cov = float(boot_scene.masks[np.asarray(scene.i_train)].mean())
        print(
            f"{layout}{nv}t{ntest}: warm {w_psnr:.2f}/{w_derr:.4f} -> "
            f"boot {b_psnr:.2f}/{b_derr:.4f} delta={b_psnr - w_psnr:+.2f}dB "
            f"cov={cov:.3f} ({time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
