"""Profile one train-step variant on the TPU and print the device-op
time breakdown (the axon relay does forward device trace events).

Usage: python tools/profile_step.py [variant] [top_n]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import ab_bench  # noqa: E402


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "v2_bf16_t1024"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    ab_bench.setup_jax()
    import jax

    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import VanillaBatcher

    scene = synthetic.make_scene(n_views=6, H=128, W=128).to_scene_data()
    if variant.startswith("mip_"):
        from consistentnerf_tpu.data.pipeline import MipBatcher
        from consistentnerf_tpu.models.factory import make_model
        from consistentnerf_tpu.train import loop as loop_lib
        from consistentnerf_tpu.train import step as step_lib

        if variant == "mip_xla":
            cfg = ab_bench.mip_cfg()
        else:
            tile = int(variant.split("_t")[-1]) if "_t" in variant else 1024
            cfg = ab_bench.mip_cfg(
                use_fused_train=True, fused_tile=tile,
                use_onepass_train=variant.startswith("mip_onepass"),
            )
        model = make_model(cfg)
        batch = MipBatcher(scene, cfg).next_batch()
        state = loop_lib.init_state(cfg, model, batch)
        if cfg.use_onepass_train:
            from consistentnerf_tpu.ops import fused_onepass

            ts = fused_onepass.build_onepass_mip_train_step(cfg,
                                                            donate=False)
        elif cfg.use_fused_train:
            from consistentnerf_tpu.ops.fused_train import (
                build_fused_mip_train_step,
            )

            ts = build_fused_mip_train_step(cfg, donate=False)
        else:
            ts = step_lib.build_train_step(model, cfg, donate=False)
    else:
        batch = VanillaBatcher(scene, ab_bench.flagship_cfg()).next_batch()
        cfg, model, state, ts, batch = ab_bench.build_variant(variant, scene,
                                                       batch)
    key = jax.random.PRNGKey(0)
    state, stats = ts(state, batch, key)
    float(stats["loss"])

    logdir = "/tmp/jtrace_step"
    shutil.rmtree(logdir, ignore_errors=True)
    REPS = 5
    # Host/python tracer events (1M cap) drown the device timeline.
    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 0
    opts.host_tracer_level = 1
    with jax.profiler.trace(logdir, profiler_options=opts):
        for _ in range(REPS):
            state, stats = ts(state, batch, key)
        float(stats["loss"])

    (trace_file,) = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    d = json.load(gzip.open(trace_file))
    evs = d.get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    per_op = {}
    total = 0.0
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e["name"]
            args = e.get("args") or {}
            label = args.get("long_name") or name
            per_op.setdefault(name, [0.0, 0, label])
            per_op[name][0] += e.get("dur", 0)
            per_op[name][1] += 1
            total += e.get("dur", 0)
    print(f"variant={variant} total_device_ms_per_step="
          f"{round(total / 1e3 / REPS, 2)}")
    for name, (dur, cnt, label) in sorted(
        per_op.items(), key=lambda kv: -kv[1][0]
    )[:top_n]:
        print(
            f"{dur / 1e3 / REPS:8.3f} ms  x{cnt // REPS:<3d} {name[:60]:60s}"
            f" {str(label)[:110]}"
        )


if __name__ == "__main__":
    main()
