"""Export per-view depth priors as PFM files.

The reference obtains its MVS depth priors from an external MVSNeRF
checkpoint via a notebook (`renderer-copy.ipynb`, writing
`nerf_*_data_depth/{scene}/depth_%04d.pfm`). This CLI produces priors in
the same layout from a trained model of *this* framework (self-priors for
iterative refinement), or converts existing depth arrays, so the
consistency pipeline has an in-framework producer.
"""

from __future__ import annotations

import os

import numpy as np


def main(argv=None):
    from consistentnerf_tpu.cli import common

    p = common.make_parser("Export depth priors (PFM) from a checkpoint")
    p.add_argument("--out", type=str, required=True,
                   help="output dir (nerf_*_data_depth/{scene} layout)")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--views", type=str, default="all",
                   choices=["all", "train"])
    args = p.parse_args(argv)
    cfg = common.resolve_config(args)

    from consistentnerf_tpu.data.loaders import load_scene
    from consistentnerf_tpu.data.pfm import write_pfm
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import render as render_lib
    from consistentnerf_tpu.train.checkpoints import CheckpointManager
    from consistentnerf_tpu.train.evaluation import camera_rays_for_view

    scene = load_scene(cfg, attach=False)
    scene.ensure_priors()
    model = make_model(cfg)
    batcher = loop_lib.make_batcher(scene, cfg)
    state = loop_lib.init_state(cfg, model, batcher.next_batch())
    ckpt = CheckpointManager(
        os.path.join(cfg.basedir, cfg.expname, "checkpoints")
    )
    state = ckpt.restore_for_eval(state, step=args.step)

    os.makedirs(args.out, exist_ok=True)
    render = render_lib.build_render_fn(model, cfg, state.params)
    views = (
        range(scene.images.shape[0])
        if args.views == "all"
        else list(scene.i_train)
    )
    for vid in views:
        rays = camera_rays_for_view(scene, scene.poses[vid])
        depth = np.asarray(render(rays)["depth"]).astype(np.float32)
        write_pfm(os.path.join(args.out, f"depth_{vid:04d}.pfm"), depth)
        print(f"wrote depth_{vid:04d}.pfm")


if __name__ == "__main__":
    main()
