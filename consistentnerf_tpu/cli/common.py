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
    # Multi-host runs must initialize the distributed runtime before the
    # first backend use; every CLI resolves its config first, so this is
    # the common chokepoint.
    from consistentnerf_tpu.parallel import mesh as mesh_lib

    mesh_lib.maybe_initialize_distributed(
        cfg.coordinator_address, cfg.num_processes, cfg.process_id
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


def setup_experiment_dir(cfg: Config) -> str:
    """Create basedir/expname and dump the resolved config (the reference
    dumps args.txt + config.txt, run_nerf_view.py:977-989)."""
    exp_dir = os.path.join(cfg.basedir, cfg.expname)
    os.makedirs(exp_dir, exist_ok=True)
    cfg.save(os.path.join(exp_dir, "config.json"))
    return exp_dir
