"""Render CLI: path rendering (spiral/spherical) of a trained checkpoint.

Covers `RegNeRF/render.py` and the `--render_only` branch of
`run_nerf_view.py:1188-1216`, including per-frame color/depth PNG dumps.
"""

from __future__ import annotations

import os

import numpy as np


def main(argv=None):
    from consistentnerf_tpu.cli import common

    p = common.make_parser("Render a camera path from a trained model")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--render-test", action="store_true",
                   help="render test poses instead of the path")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)
    cfg = common.resolve_config(args)
    exp_dir = os.path.join(cfg.basedir, cfg.expname)

    from consistentnerf_tpu.data.loaders import load_scene
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import render as render_lib
    from consistentnerf_tpu.train import vis
    from consistentnerf_tpu.train.checkpoints import CheckpointManager
    from consistentnerf_tpu.train.evaluation import camera_rays_for_view

    scene = load_scene(cfg)
    model = make_model(cfg)

    batcher = loop_lib.make_batcher(scene, cfg)
    state = loop_lib.init_state(cfg, model, batcher.next_batch())
    ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
    state = ckpt.restore(state, step=args.step)
    step = int(state.step)

    if args.render_test:
        poses = scene.poses[scene.i_test]
        tag = "test"
    else:
        poses = (
            scene.render_poses
            if scene.render_poses is not None
            else scene.poses[scene.i_test]
        )
        tag = "path"

    out_dir = args.out or os.path.join(
        exp_dir, f"renderonly_{tag}_{step:06d}"
    )
    os.makedirs(out_dir, exist_ok=True)

    render = render_lib.build_render_fn(model, cfg, state.params)
    for i, pose in enumerate(poses):
        rays = camera_rays_for_view(scene, np.asarray(pose))
        out = {k: np.asarray(v) for k, v in render(rays).items()}
        vis.save_img_u8(out["rgb"],
                        os.path.join(out_dir, f"color_{i:03d}.png"))
        vis.save_img_u8(
            vis.visualize_depth(out["depth"], out["acc"]),
            os.path.join(out_dir, f"depth_{i:03d}.png"),
        )
        print(f"rendered {i + 1}/{len(poses)}")
    print("wrote", out_dir)


if __name__ == "__main__":
    main()
