"""Hardware A/B harness for the train-step and render fast paths.

Runs on the attached TPU, ONE process at a time (the axon relay wedges on
concurrent claims). Per-claim perf varies up to ~4-7x, so comparisons are
only meaningful WITHIN one invocation; each variant reports best-of-N
trials of an evolving-state loop with a float(loss) hard sync.

Usage:
    python tools/ab_bench.py [variant ...]
variants: xla fused_fp32 fused_bf16 fused_bf16_t512 render_xla
          render_fused render_fused_bf16 (default: all train variants)
"""

from __future__ import annotations

import json
import sys
import time


def setup_jax():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def flagship_cfg(**kw):
    from consistentnerf_tpu.configs import Config

    base = dict(
        backbone="vanilla",
        N_samples=64,
        N_importance=128,
        N_rand=4096,
        n_patches=4,
        patch_size=16,
        hardmask=True,
        with_depth_loss=True,
        white_bkgd=True,
        use_tensorboard=False,
        compute_dtype="bfloat16",
    )
    base.update(kw)
    return Config(**base)


def build_variant(name, scene, batch):
    import jax

    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import step as step_lib

    if name == "xla":
        cfg = flagship_cfg()
    elif name == "fused_fp32":
        cfg = flagship_cfg(use_fused_train=True, compute_dtype="float32",
                           fused_tile=256)
    elif name == "fused_bf16":
        cfg = flagship_cfg(use_fused_train=True, fused_tile=256)
    elif name == "fused_bf16_t512":
        cfg = flagship_cfg(use_fused_train=True, fused_tile=512)
    elif name == "fused_bf16_t1024":
        cfg = flagship_cfg(use_fused_train=True, fused_tile=1024)
    else:
        raise ValueError(name)

    model = make_model(cfg)
    state = loop_lib.init_state(cfg, model, batch)
    if cfg.use_fused_train:
        from consistentnerf_tpu.ops.fused_train import (
            build_fused_vanilla_train_step,
        )

        ts = build_fused_vanilla_train_step(cfg, donate=False)
    else:
        ts = step_lib.build_train_step(model, cfg, donate=False)
    return cfg, model, state, ts


def check_forward(name, cfg, model, state, batch):
    """Max |rgb err| of this variant's forward vs the XLA forward.

    Detects the Mosaic bf16 miscompile class (err ~1.0 on HW while
    interpret mode is fine)."""
    import numpy as np

    from consistentnerf_tpu.train import step as step_lib

    rays = step_lib.rays_from_batch(batch, cfg.near, cfg.far)
    out_ref = model.apply(state.params, None, rays)
    if cfg.use_fused_train:
        from consistentnerf_tpu.ops.fused_train import fused_vanilla_forward

        out = fused_vanilla_forward(state.params, None, rays, cfg,
                                    tile=cfg.fused_tile)
    else:
        out = out_ref
    err = float(np.abs(np.asarray(out["rgb"])
                       - np.asarray(out_ref["rgb"])).max())
    derr = float(np.abs(np.asarray(out["depth"])
                        - np.asarray(out_ref["depth"])).max())
    return err, derr


def time_variant(name, state, ts, batch, n_steps=20, trials=3):
    import jax

    key = jax.random.PRNGKey(0)
    state, stats = ts(state, batch, key)  # compile
    float(stats["loss"])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, stats = ts(state, batch, key)
        loss = float(stats["loss"])
        dt = time.perf_counter() - t0
        best = min(best, dt / n_steps)
    return best, loss


def run_train_variants(names):
    import jax

    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import VanillaBatcher

    cfg0 = flagship_cfg()
    scene = synthetic.make_scene(n_views=6, H=128, W=128).to_scene_data()
    batch = VanillaBatcher(scene, cfg0).next_batch()
    n_rays = batch["rgb"].shape[0]

    results = {}
    for name in names:
        t_start = time.time()
        cfg, model, state, ts = build_variant(name, scene, batch)
        err, derr = check_forward(name, cfg, model, state, batch)
        ms, loss = time_variant(name, state, ts, batch)
        results[name] = dict(
            ms_per_step=round(ms * 1e3, 2),
            rays_per_sec=round(n_rays / ms, 0),
            fwd_rgb_err_vs_xla=round(err, 5),
            fwd_depth_err_vs_xla=round(derr, 5),
            final_loss=round(loss, 5),
            total_wall_s=round(time.time() - t_start, 1),
        )
        print(name, json.dumps(results[name]), flush=True)
    return results


def run_render_variants(names):
    import jax
    import numpy as np

    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import VanillaBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import evaluation
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import render as render_lib

    results = {}
    scene = synthetic.make_scene(n_views=6, H=128, W=128).to_scene_data()
    for name in names:
        kw = dict()
        if name == "render_fused":
            kw = dict(use_fused_render=True, compute_dtype="float32",
                      fused_tile=512)
        elif name == "render_fused_bf16":
            kw = dict(use_fused_render=True, fused_tile=512)
        cfg = flagship_cfg(render_chunk_size=8192, **kw)
        model = make_model(cfg)
        batch = VanillaBatcher(scene, cfg).next_batch()
        state = loop_lib.init_state(cfg, model, batch)
        render = render_lib.build_render_fn(model, cfg, state.params)
        rays = evaluation.camera_rays_for_view(scene, scene.poses[0])
        out = render(rays)  # compile
        ref_rgb = np.asarray(out["rgb"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = render(rays)
            s = float(np.asarray(out["rgb"]).sum())
            best = min(best, time.perf_counter() - t0)
        n_rays = rays.origins.shape[0] * rays.origins.shape[1]
        results[name] = dict(
            ms_per_image=round(best * 1e3, 2),
            rays_per_sec=round(n_rays / best, 0),
            checksum=round(s, 3),
        )
        print(name, json.dumps(results[name]), flush=True)
    return results


def main():
    setup_jax()
    args = sys.argv[1:] or ["xla", "fused_fp32", "fused_bf16",
                            "fused_bf16_t512"]
    train_names = [a for a in args if not a.startswith("render")]
    render_names = [a for a in args if a.startswith("render")]
    out = {}
    if train_names:
        out.update(run_train_variants(train_names))
    if render_names:
        out.update(run_render_variants(render_names))
    print("SUMMARY " + json.dumps(out))


if __name__ == "__main__":
    main()
