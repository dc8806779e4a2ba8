"""Benchmark: throughput of the flagship configs on the attached
accelerator. Prints ONE JSON line (the driver contract). The default
mode measures all three surfaces and reports the vanilla-train headline
with `extras` carrying the render and mip numbers from the same claim;
`--mode train|render|mip|eval` measures a single surface.

Modes:
  train  (default) — ConsistentNeRF vanilla trainer at production budget
         (64 coarse + 128 fine samples/ray, 4096 random + 1024 patch rays
         per step, hard-mask + depth + MiDaS patch losses,
         `run_nerf_view.py:696-741`), rays/sec.
  render — deterministic full-image render throughput (the eval/render
         path, `run_nerf_view.py:140-180` chunk loops in the reference),
         rays/sec.
  mip    — mip/RegNeRF backbone train step (96x2 samples, 4x16x16 patch
         batch + TV-norm random patches), rays/sec.
  eval   — full evaluate() throughput: stacked renders + the on-device
         jitted metric suite with one end fetch (RUNS_r5.md §4).

Baseline (vs_baseline denominator): the reference publishes no numbers
(BASELINE.md), so 25,000 rays/sec is used as the reference-class anchor
for the PyTorch trainer on one modern GPU. Analytic bound backing that
number: the step costs N_rays*(64+128) samples x ~0.6 MFLOP/point forward
(63->256 + 8x256/319x256 trunk + heads) x ~3 for fwd+bwd
= 5120*192*0.6e6*3 ~= 1.8 TFLOP/step in fp32 torch. On a ~20 fp32-TFLOPS
GPU that is 57k rays/s at IMPOSSIBLE 100% MFU; the chunked host loops
(8k-ray render chunks, 16k-point net chunks, per-chunk kernel launches)
put realistic utilization at 20-45%, i.e. 12k-26k rays/s. 25k is the
generous top of that class; vs_baseline therefore UNDERSTATES the speedup.
"""

from __future__ import annotations

import argparse
import json
import time

REFERENCE_RAYS_PER_SEC = 25_000.0


def _setup_jax():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def _scene():
    from consistentnerf_tpu.data import synthetic

    return synthetic.make_scene(n_views=6, H=128, W=128).to_scene_data()


def bench_train() -> dict:
    jax = _setup_jax()
    from consistentnerf_tpu.configs import Config
    from consistentnerf_tpu.data.pipeline import VanillaBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.parallel import create_mesh, shard_batch
    from consistentnerf_tpu.train import loop as loop_lib

    cfg = Config(
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
        # One-pass megakernel step (MLP fwd + compositing + loss
        # cotangents + bwd in one pallas call per level): 48.6 ms vs
        # 60.3 (two-call fused) vs 86.0 (XLA) on v5e, tools/ab_bench.py.
        use_fused_train=True,
        use_onepass_train=True,
        fused_tile=1024,
    )
    cfg = _apply_fallback(cfg)
    scene = _scene()
    mesh = create_mesh()
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    n_rays = batch["rgb"].shape[0]

    state = loop_lib.init_state(cfg, model, batch)
    # The exact production dispatch (one-pass -> fused -> XLA by config)
    train_step = loop_lib.select_train_step(cfg, model, mesh=mesh)

    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)
    state, stats = train_step(state, sharded, key)  # compile
    float(stats["loss"])

    # The shared-pool TPU shows large per-claim performance variance;
    # take the best of several trials as the hardware-capability number.
    # Evolving-state loop + float(loss) hard sync (block_until_ready has
    # been observed returning early through the remote TPU relay).
    n_steps = 20
    batches = [shard_batch(batcher.next_batch(), mesh) for _ in range(4)]
    best_dt = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, stats = train_step(state, batches[i % 4], key)
        float(stats["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)

    rays_per_sec = n_steps * n_rays / best_dt
    out = {
        "metric": "train_rays_per_sec_vanilla_64c128f",
        "value": round(rays_per_sec, 1),
        "unit": "rays/sec",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
    }
    guard = _loss_guard_vanilla(cfg, model, state, sharded)
    if guard is not None:
        out["step_loss_err_vs_xla"] = guard
    return out


def bench_render() -> dict:
    jax = _setup_jax()
    import numpy as np

    from consistentnerf_tpu.configs import Config
    from consistentnerf_tpu.data.pipeline import VanillaBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import evaluation
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import render as render_lib

    cfg = Config(
        backbone="vanilla", N_samples=64, N_importance=128,
        white_bkgd=True, use_tensorboard=False, compute_dtype="bfloat16",
        render_chunk_size=8192,
        # Fused bf16 render wins its A/B vs the XLA render path on v5e
        # (95.2 vs 115.0 ms/image, tools/ab_bench.py).
        use_fused_render=True,
        fused_tile=1024,
    )
    cfg = _apply_fallback(cfg)
    scene = _scene()
    model = make_model(cfg)
    batch = VanillaBatcher(scene, cfg).next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    render = render_lib.build_render_fn(model, cfg, state.params)
    all_rays = [evaluation.camera_rays_for_view(scene, p)
                for p in scene.poses]
    n_rays = (all_rays[0].origins.shape[0]
              * all_rays[0].origins.shape[1])
    # The real render workload is a SEQUENCE of views (eval loop, pose
    # path): render the whole stack in ONE dispatch (train/render.py
    # multi-view batching, cli/render.py --views-per-call) so the relay
    # dispatch latency is amortized across views. Distinct poses —
    # identical repeated executions can be served from a relay cache.
    stacked = render_lib.stack_rays(all_rays)
    out = render(stacked)  # compile
    float(np.asarray(out["rgb"]).sum())
    best = float("inf")
    for trial in range(3):
        # Tiny per-trial origin offset: identical repeated executions can
        # be served from a relay cache (CLAUDE.md timing caveats).
        trial_rays = stacked.replace(
            origins=stacked.origins + 1e-6 * (trial + 1)
        )
        t0 = time.perf_counter()
        out = render(trial_rays)
        float(np.asarray(out["rgb"]).sum())
        best = min(best, time.perf_counter() - t0)
    rps = len(all_rays) * n_rays / best
    # Reference render path: same MLP budget forward-only, no backward
    # (~0.6 TFLOP per 16k-ray image in fp32) -> reference class ~3x the
    # train number per ray; use 75k rays/s as the render anchor.
    return {
        "metric": "render_rays_per_sec_vanilla_64c128f",
        "value": round(rps, 1),
        "unit": "rays/sec",
        "vs_baseline": round(rps / 75_000.0, 3),
    }


def bench_eval() -> dict:
    """Full evaluate() throughput — stacked renders + the on-device
    jitted metric suite (PSNR/SSIM/census) with a single end fetch
    (RUNS_r5.md §4). The surface RegNeRF logs as eval speed
    (train.py:518-521); the reference's eval is its render loop plus
    host metrics, so the render-class anchor (75k rays/s, generous)
    UNDERSTATES the speedup. One trial only: the warm window already
    excludes the compiles, and repeating the identical execution risks
    the relay cache (CLAUDE.md timing caveats)."""
    jax = _setup_jax()
    import numpy as np

    from consistentnerf_tpu.configs import Config
    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import VanillaBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import evaluation
    from consistentnerf_tpu.train import loop as loop_lib

    cfg = Config(
        backbone="vanilla", N_samples=64, N_importance=128,
        white_bkgd=True, use_tensorboard=False, compute_dtype="bfloat16",
        render_chunk_size=8192, use_fused_render=True, fused_tile=1024,
        eval_disable_lpips=True, eval_save_output=False,
    )
    cfg = _apply_fallback(cfg)
    scene = synthetic.make_scene(n_views=12, H=128, W=128).to_scene_data()
    model = make_model(cfg)
    batch = VanillaBatcher(scene, cfg).next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    metrics = evaluation.evaluate(
        model, cfg, state.params, scene, out_dir=None,
        views=np.arange(len(scene.images)), save_images=False, step=0,
    )
    rps = float(metrics.get("eval_rays_per_sec", 0.0))
    return {
        "metric": "eval_rays_per_sec_vanilla_64c128f",
        "value": round(rps, 1),
        "unit": "rays/sec",
        "vs_baseline": round(rps / 75_000.0, 3),
    }


def bench_mip() -> dict:
    jax = _setup_jax()
    from consistentnerf_tpu.configs import Config
    from consistentnerf_tpu.data.pipeline import MipBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.parallel import create_mesh, shard_batch
    from consistentnerf_tpu.train import loop as loop_lib

    cfg = Config(
        backbone="mipnerf",
        mip_num_samples=96,
        mip_num_levels=2,
        N_rand=4096 - 4 * 256,
        disable_normals=True,
        white_bkgd=True,
        use_tensorboard=False,
        compute_dtype="bfloat16",
        use_hardmask=True,
        compute_depth_metrics=True,
        compute_mono_depth_metrics=True,
        dataset_type="blender",
        # Transposed fused mip step: 36.2 vs 46.4 ms XLA on v5e
        # (tools/ab_bench.py mip_xla vs mip_fused); one-pass megakernel
        # on top where supported.
        use_fused_train=True,
        use_onepass_train=True,
        fused_tile=1024,
    )
    cfg = _apply_fallback(cfg)
    scene = _scene()
    mesh = create_mesh()
    model = make_model(cfg)
    batcher = MipBatcher(scene, cfg)
    batch = batcher.next_batch()
    n_rays = batch["rgb"].shape[0]
    state = loop_lib.init_state(cfg, model, batch)
    train_step = loop_lib.select_train_step(cfg, model, mesh=mesh)
    key = jax.random.PRNGKey(0)
    sharded = shard_batch(batch, mesh)
    state, stats = train_step(state, sharded, key)
    float(stats["loss"])
    n_steps = 20
    batches = [shard_batch(batcher.next_batch(), mesh) for _ in range(4)]
    best_dt = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, stats = train_step(state, batches[i % 4], key)
        float(stats["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)
    rps = n_steps * n_rays / best_dt
    # The mip step costs ~2x96 samples at the same MLP budget: same
    # 25k rays/s reference class per ray.
    out = {
        "metric": "train_rays_per_sec_mip_96x2",
        "value": round(rps, 1),
        "unit": "rays/sec",
        "vs_baseline": round(rps / REFERENCE_RAYS_PER_SEC, 3),
    }
    guard = _loss_guard_mip(cfg, model, state, sharded)
    if guard is not None:
        out["step_loss_err_vs_xla"] = guard
    return out


def _loss_guard(build_kernel_step, build_xla_step, state, batch):
    """|loss(kernel step) - loss(XLA step)| from the SAME trained
    state/batch/key, both deterministic — the hardware-truth correctness
    signal next to the speed number, so a Mosaic miscompile shows up in
    BENCH_r*.json as a value instead of a silent fallback. Run at the
    post-timing (trained) state: at random init the fine-level resampling
    amplifies rounding into bin flips and the diff measures sampling
    noise, not bugs. Returns None only when the active tier has no
    kernel to guard (XLA fallback); a guard that CRASHES returns the
    explicit marker "guard_failed" so the JSON line distinguishes
    'not applicable' from 'the check itself broke' (ADVICE r4)."""
    import jax

    try:
        key = jax.random.PRNGKey(7)
        _, st_k = build_kernel_step()(state, batch, key)
        _, st_x = build_xla_step()(state, batch, key)
        return round(abs(float(st_k["loss"]) - float(st_x["loss"])), 6)
    except Exception:  # noqa: BLE001 — the guard must not kill the line
        import sys
        import traceback

        print("# loss guard failed: "
              f"{traceback.format_exc(limit=3)}".replace("\n", " "),
              file=sys.stderr, flush=True)
        return "guard_failed"


def _loss_guard_vanilla(cfg, model, state, batch):
    if not (cfg.use_fused_train and cfg.use_onepass_train):
        return None
    from consistentnerf_tpu.ops import fused_onepass
    from consistentnerf_tpu.train import step as step_lib

    det = cfg.replace(perturb=0.0)
    return _loss_guard(
        lambda: fused_onepass.build_onepass_vanilla_train_step(
            det, donate=False),
        lambda: step_lib.build_train_step(model, det, donate=False),
        state, batch,
    )


def _loss_guard_mip(cfg, model, state, batch):
    if not (cfg.use_fused_train and cfg.use_onepass_train):
        return None
    from consistentnerf_tpu.ops import fused_onepass
    from consistentnerf_tpu.train import step as step_lib

    det = cfg.replace(randomized=False)
    return _loss_guard(
        lambda: fused_onepass.build_onepass_mip_train_step(
            det, donate=False),
        lambda: step_lib.build_train_step(model, det, donate=False),
        state, batch,
    )


def _guarded(fn):
    """Run a bench surface; on failure retry with progressively simpler
    paths (two-call fused, then XLA) via _BENCH_FALLBACK so one broken
    kernel cannot zero out the whole driver-recorded line."""
    global _BENCH_FALLBACK
    for tier in ("onepass", "fused", "xla"):
        _BENCH_FALLBACK = tier
        try:
            out = fn()
            if tier != "onepass":
                out["fallback_path"] = tier
            return out
        except Exception:  # noqa: BLE001 — deliberate resilience
            import sys
            import traceback

            # stderr: stdout must stay exactly one JSON line (driver
            # contract)
            print(f"# bench tier {tier!r} failed: "
                  f"{traceback.format_exc(limit=3)}".replace("\n", " "),
                  file=sys.stderr, flush=True)
    return {"metric": "bench_failed", "value": 0.0, "unit": "error",
            "vs_baseline": 0.0}


_BENCH_FALLBACK = "onepass"


def _apply_fallback(cfg):
    """Downgrade cfg to the current fallback tier."""
    if _BENCH_FALLBACK == "onepass":
        return cfg
    if _BENCH_FALLBACK == "fused":
        return cfg.replace(use_onepass_train=False, use_pdf_kernel=False,
                           use_onepass_render=False)
    return cfg.replace(use_fused_train=False, use_onepass_train=False,
                       use_fused_render=False, use_pdf_kernel=False,
                       use_onepass_render=False)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "render", "mip", "eval", "all"],
                   default="all")
    args = p.parse_args()
    fns = {"train": bench_train, "render": bench_render,
           "mip": bench_mip, "eval": bench_eval}
    if args.mode == "all":
        # One JSON line carrying the whole perf surface from one claim:
        # vanilla-train headline + render/mip in `extras`.
        line = _guarded(bench_train)
        line["extras"] = {"render": _guarded(bench_render),
                          "mip": _guarded(bench_mip),
                          "eval": _guarded(bench_eval)}
        print(json.dumps(line))
    else:
        print(json.dumps(_guarded(fns[args.mode])))


if __name__ == "__main__":
    main()
