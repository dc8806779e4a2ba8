"""Train the learned MVS depth-prior network and export its priors.

The in-framework replacement for the reference's external depth-prior
producer (`renderer-copy.ipynb` running a pretrained MVSNeRF to write
`nerf_*_data_depth/{scene}/depth_%04d.pfm`): fits `models/mvs.py` on the
scene's own train views (GT-depth supervised where the dataset has GT,
photometric self-supervised otherwise), writes the predicted priors in
the reference PFM layout, and optionally the hard masks derived from
them — so a fresh scene needs no external checkpoint to run the full
consistency pipeline.
"""

from __future__ import annotations

import os

import numpy as np


def main(argv=None):
    from consistentnerf_tpu.cli import common

    p = common.make_parser("Train the MVS depth-prior net, export PFMs")
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--out", type=str, default=None,
                   help="output dir (default <expdir>/mvs_priors)")
    p.add_argument("--with-masks", action="store_true",
                   help="also write hard masks derived from the priors")
    args = p.parse_args(argv)
    cfg = common.resolve_config(args)

    from consistentnerf_tpu.consistency import reproject
    from consistentnerf_tpu.data.loaders import load_scene
    from consistentnerf_tpu.data.pfm import write_pfm
    from consistentnerf_tpu.train import mvs as mvs_train

    scene = load_scene(cfg, attach=False)
    scene.ensure_priors()
    result = mvs_train.train_mvs_depth(cfg, scene, num_steps=args.steps)
    priors = mvs_train.predict_depth_priors(cfg, scene, result.params)

    i_train = np.asarray(scene.i_train)
    ref = np.asarray(scene.depths)[i_train]
    if float(np.max(ref)) > 0:
        valid = ref > 0
        mse = float(np.mean((priors[i_train][valid] - ref[valid]) ** 2))
        # Only call it GT when the scene's depths actually are (DTU
        # scans / synthetic analytic); loaded PFM priors are estimates.
        kind = "GT" if scene.depth_is_gt else "existing prior (NOT GT)"
        print(f"prior depth-MSE vs scene {kind} on train views: {mse:.5f}")

    out = args.out or os.path.join(cfg.basedir, cfg.expname, "mvs_priors")
    os.makedirs(out, exist_ok=True)
    for vid in i_train:
        write_pfm(os.path.join(out, f"depth_{vid:04d}.pfm"), priors[vid])
    print(f"wrote {len(i_train)} depth PFMs to {out}")

    if args.with_masks:
        import imageio.v2 as imageio

        masks = reproject.compute_hard_masks(
            scene.poses, priors, scene.K, i_train, scene.H, scene.W,
            occlusion_threshold=cfg.occlusion_threshold,
        )
        for vid in i_train:
            imageio.imwrite(
                os.path.join(out, f"{vid}_mask_mvs.jpg"),
                (masks[vid] * 255).astype(np.uint8),
            )
        print(f"wrote {len(i_train)} hard masks to {out}")


if __name__ == "__main__":
    main()
