"""Mask-generation CLI: precompute hard masks on-device and save JPGs.

Covers the reference's standalone mask generation
(`run_nerf_view_cal_correspondance.py`, `mask_utils/mask_generator.py`):
masks are written as `{i}_mask_{n}view.jpg` plus a packed .npy cache.
"""

from __future__ import annotations

import os

import numpy as np


def main(argv=None):
    from consistentnerf_tpu.cli import common

    p = common.make_parser("Generate reprojection hard masks")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)
    cfg = common.resolve_config(args)

    from consistentnerf_tpu.consistency import reproject
    from consistentnerf_tpu.data.loaders import load_scene

    scene = load_scene(cfg, attach=False)
    scene.ensure_priors()
    masks = reproject.compute_hard_masks(
        scene.poses,
        scene.depths,
        scene.K,
        scene.i_train,
        scene.H,
        scene.W,
        occlusion_threshold=cfg.occlusion_threshold,
    )

    scene_name = os.path.basename(os.path.normpath(cfg.datadir))
    out_dir = args.out or os.path.join(
        cfg.basedir, cfg.expname, "mask", scene_name,
        f"{cfg.train_view_num}view",
    )
    os.makedirs(out_dir, exist_ok=True)
    import imageio.v2 as imageio

    for i in range(masks.shape[0]):
        imageio.imwrite(
            os.path.join(out_dir,
                         f"{i}_mask_{cfg.train_view_num}view.jpg"),
            (masks[i] * 255).astype(np.uint8),
        )
    np.save(os.path.join(out_dir, "masks.npy"), masks)
    print(f"wrote {masks.shape[0]} masks to {out_dir}")


if __name__ == "__main__":
    main()
