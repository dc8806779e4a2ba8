"""Shared CLI plumbing: config flags + experiment dir setup."""

from __future__ import annotations

import argparse
import os

from consistentnerf_tpu.configs import Config, load_config


def make_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", type=str, default=None,
                   help="JSON config file")
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


def setup_experiment_dir(cfg: Config) -> str:
    """Create basedir/expname and dump the resolved config (the reference
    dumps args.txt + config.txt, run_nerf_view.py:977-989)."""
    exp_dir = os.path.join(cfg.basedir, cfg.expname)
    os.makedirs(exp_dir, exist_ok=True)
    cfg.save(os.path.join(exp_dir, "config.json"))
    return exp_dir
