"""Shared CLI plumbing: config flags + experiment dir setup."""

from __future__ import annotations

import argparse
import os

from consistentnerf_tpu.configs import Config, load_config


def make_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", type=str, default=None,
                   help="config file: native JSON, or a reference "
                        "experiment file (.gin from the RegNeRF grid, "
                        ".txt from the nerf-pytorch config_parser)")
    p.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="config override (repeatable), e.g. --set N_rand=2048",
    )
    p.add_argument("--scene", type=str, default=None,
                   help="named scene preset from configs.scenes")
    p.add_argument("--list-scenes", action="store_true",
                   help="list scene presets and exit")
    return p


def resolve_config(args) -> Config:
    if getattr(args, "list_scenes", False):
        from consistentnerf_tpu.configs import scenes

        for name in scenes.list_scenes():
            print(name)
        raise SystemExit(0)
    if args.scene:
        from consistentnerf_tpu.configs import scenes

        cfg = scenes.get_scene_config(args.scene)
        from consistentnerf_tpu.configs import parse_overrides

        cfg = parse_overrides(cfg, args.overrides)
    else:
        cfg = load_config(args.config, args.overrides)
    # Every CLI resolves its config first, so this is the common
    # chokepoint: persist compiled programs across processes (TPU
    # compiles go through a remote tunnel here, 4-15 min for the big
    # train programs; the cache turns repeat runs/evals into seconds).
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    # Multi-host runs must initialize the distributed runtime before the
    # first backend use.
    from consistentnerf_tpu.parallel import mesh as mesh_lib

    mesh_lib.maybe_initialize_distributed(
        cfg.coordinator_address, cfg.num_processes, cfg.process_id
    )
    return cfg


def explicit_keys(args) -> set:
    """Config keys the user explicitly set via --set or a config file.

    Scene presets are recipe *defaults*, not user intent, so they are
    deliberately not included: a preset value can be reconciled, an
    explicit flag is always honored.
    """
    explicit = {o.split("=")[0].strip() for o in getattr(args, "overrides", [])}
    if getattr(args, "config", None):
        from consistentnerf_tpu.configs import config_file_keys

        explicit |= config_file_keys(args.config)
    return explicit


def reconcile_schedule_horizon(cfg: Config, args) -> Config:
    """Keep `--num-steps` and the schedule horizon `total_iters` coherent.

    The reference never had this trap: RegNeRF's lr decay is defined over
    `max_steps` and its loop length IS max_steps
    (RegNeRF/internal/math.py:134-166, train.py:67-294). Here the loop
    length (`--num-steps`) and the schedule horizon (`total_iters`) are
    separate knobs, and running 3k steps against the 50k default horizon
    leaves lr pinned at lr_init and the near/far anneal squeezing
    sampling to mid-depth for most of training — a measured hardware
    divergence (RUNS_r4.md §10, queue J: final PSNR 7.78).

    Policy:
    - `--num-steps N` with `total_iters` NOT explicitly set (--set /
      config file): the horizon follows N. `anneal_nearfar_steps` and
      `lr_delay_steps`, when also non-explicit, rescale proportionally
      so the recipe keeps its shape.
    - both explicit and N < 0.2 * total_iters with schedules active:
      loud warning (the user may be resuming a longer run, so we do not
      override an explicit horizon).
    """
    num_steps = getattr(args, "num_steps", None)
    if not num_steps or num_steps == cfg.total_iters:
        return cfg
    explicit = explicit_keys(args)
    import warnings

    if "total_iters" not in explicit:
        old = cfg.total_iters
        updates = {"total_iters": int(num_steps)}
        for key in ("anneal_nearfar_steps", "lr_delay_steps"):
            if key not in explicit:
                val = getattr(cfg, key)
                if 0 < val:
                    updates[key] = max(1, round(val * num_steps / old))
        print(
            f"[schedule] --num-steps={num_steps} != total_iters={old}; "
            f"rescaling schedule horizon: "
            + ", ".join(f"{k}={v}" for k, v in updates.items())
            + " (pass --set total_iters=... to pin the horizon explicitly)"
        )
        return cfg.replace(**updates)
    schedules_active = (cfg.lr_final != cfg.lr_init) or cfg.anneal_nearfar
    if schedules_active and num_steps < 0.2 * cfg.total_iters:
        warnings.warn(
            f"--num-steps={num_steps} is <20% of the explicit schedule "
            f"horizon total_iters={cfg.total_iters}: lr will only decay "
            f"{cfg.lr_init:g}->~{cfg.lr_init * (cfg.lr_final / cfg.lr_init) ** (num_steps / cfg.total_iters):.2g} "
            f"and anneal_nearfar={cfg.anneal_nearfar} runs on the long "
            f"horizon. This configuration diverged on hardware "
            f"(RUNS_r4.md queue J). Intended only when resuming a "
            f"longer run.",
            stacklevel=2,
        )
    return cfg


def auto_fused_defaults(cfg: Config, args) -> Config:
    """Enable the fused Pallas paths on real accelerators by default.

    v5e A/Bs (tools/ab_bench.py): the fused transposed-stream train step
    beats the XLA step 59.6 vs 86.0 ms on the flagship config, and the
    fused bf16 render beats the XLA render 95.2 vs 115.0 ms/image. On
    CPU the kernels run in slow interpret mode, so the default is
    platform-dependent. Explicit --set / config-file keys always win.

    Fused render is only auto-enabled when the config already computes
    in bfloat16 (the fp32 fused render loses its A/B, and fp32 eval is
    the reference-parity default).
    """
    explicit = {o.split("=")[0].strip() for o in args.overrides}
    if getattr(args, "config", None):
        from consistentnerf_tpu.configs import config_file_keys

        explicit |= config_file_keys(args.config)
    import jax

    import jax.numpy as jnp

    vanilla_ok = (
        cfg.backbone == "vanilla"
        and cfg.use_viewdirs
        and 3 * cfg.multires <= 60
        and 3 * cfg.multires_views <= 60
    )
    # Transposed fused mip kernels: 36.2 vs 46.4 ms on v5e.
    mip_render_ok = (
        cfg.backbone == "mipnerf"
        and cfg.stop_level_grad
        and cfg.min_deg_point == 0
        and 3 * cfg.max_deg_point <= 60
    )
    # The TRAIN step additionally requires disable_normals (the normals
    # forward has no VJP rule); the render path computes them in-kernel.
    mip_ok = mip_render_ok and cfg.disable_normals
    # Gate on the live device list, not default_backend(): after a
    # mid-process jax_platforms=cpu switch default_backend() can still
    # report the accelerator (same check as ops.fused_mlp.auto_interpret).
    all_cpu = all(d.platform == "cpu" for d in jax.devices())
    if all_cpu or not (vanilla_ok or mip_render_ok):
        return cfg
    updates = {}
    if ("use_fused_train" not in explicit and not cfg.use_fused_train
            and (vanilla_ok or mip_ok)):
        updates["use_fused_train"] = True
        if "fused_tile" not in explicit:
            updates["fused_tile"] = 1024
    # One-pass megakernel step (fwd+composite+loss-cotangent+bwd in one
    # pallas call per level): 48.6 vs 60.3 ms on the flagship v5e A/B.
    # train/loop falls back to the two-call fused step when
    # onepass_supported(cfg) is false, so enabling is always safe.
    if ("use_onepass_train" not in explicit
            and not cfg.use_onepass_train
            and (cfg.use_fused_train or "use_fused_train" in updates)):
        updates["use_onepass_train"] = True
    if ("use_fused_render" not in explicit
            and not cfg.use_fused_render
            and jnp.dtype(cfg.compute_dtype) == jnp.bfloat16):
        updates["use_fused_render"] = True
        if "fused_tile" not in explicit and "fused_tile" not in updates:
            updates["fused_tile"] = 1024
    return cfg.replace(**updates) if updates else cfg


def guard_known_compiler_ice(cfg: Config, args=None) -> Config:
    """Reroute a config class that crashes this libtpu build's compiler.

    The pure-XLA vanilla train step at N_samples=32, N_importance=64
    trips a register-allocation RET_CHECK inside libtpu AOT compilation
    (live_range_finder.cc:29, jellyfish regalloc — RUNS_r4.md F4). That
    is a toolchain bug, not a semantics limit: the fused/one-pass Pallas
    steps compile and train at exactly those shapes. A legal user config
    must not dump a raw compiler crash, so on TPU backends:

    - if the fused step can express the config: reroute to it with a
      logged notice (set CNERF_ALLOW_ICE_SHAPES=1 to skip the guard,
      e.g. on a libtpu build where the bug is fixed);
    - otherwise: fail with an actionable message naming the bug.
    """
    import jax

    if os.environ.get("CNERF_ALLOW_ICE_SHAPES"):
        return cfg
    if cfg.backbone != "vanilla" or cfg.use_fused_train:
        return cfg
    if not (cfg.N_samples == 32 and cfg.N_importance == 64):
        return cfg
    if all(d.platform == "cpu" for d in jax.devices()):
        return cfg
    fusible = (
        cfg.use_viewdirs
        and 3 * cfg.multires <= 60
        and 3 * cfg.multires_views <= 60
    )
    if fusible:
        print(
            "[compiler-guard] the pure-XLA vanilla train step at "
            "N_samples=32, N_importance=64 crashes this libtpu build "
            "(live_range_finder.cc RET_CHECK, RUNS_r4.md F4); rerouting "
            "to the fused train step, which compiles at these shapes. "
            "Set CNERF_ALLOW_ICE_SHAPES=1 to attempt the XLA path anyway."
        )
        updates = {"use_fused_train": True, "use_onepass_train": True}
        if cfg.fused_tile <= 0:
            updates["fused_tile"] = 1024
        return cfg.replace(**updates)
    raise RuntimeError(
        "This config (vanilla backbone, N_samples=32, N_importance=64, "
        "XLA train step) is known to crash the TPU compiler in this "
        "libtpu build (live_range_finder.cc RET_CHECK — a toolchain "
        "bug, see RUNS_r4.md F4), and the fused fallback cannot express "
        f"it (use_viewdirs={cfg.use_viewdirs}, multires={cfg.multires}, "
        f"multires_views={cfg.multires_views} exceed the kernel's "
        "60-feature PE budget). Change N_samples/N_importance, reduce "
        "multires to <=20, or set CNERF_ALLOW_ICE_SHAPES=1 to attempt "
        "the compile anyway."
    )


def setup_experiment_dir(cfg: Config) -> str:
    """Create basedir/expname and dump the resolved config (the reference
    dumps args.txt + config.txt, run_nerf_view.py:977-989)."""
    exp_dir = os.path.join(cfg.basedir, cfg.expname)
    os.makedirs(exp_dir, exist_ok=True)
    cfg.save(os.path.join(exp_dir, "config.json"))
    return exp_dir
