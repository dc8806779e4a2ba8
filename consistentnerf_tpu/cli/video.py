"""Video generation CLI: stitch color/depth frame pairs into an mp4.

Covers `alky/video_generation.py` / `RegNeRF/video_generation.py`:
side-by-side `color_%03d.png` + `depth_%03d.png` frames at 30 fps.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Stitch rendered frames to mp4")
    p.add_argument("frames_dir", help="dir with color_###.png / depth_###.png")
    p.add_argument("--out", default=None)
    p.add_argument("--fps", type=int, default=30)
    args = p.parse_args(argv)

    import cv2

    colors = sorted(glob.glob(os.path.join(args.frames_dir, "color_*.png")))
    if not colors:
        raise SystemExit(f"no color_*.png frames in {args.frames_dir}")
    out_path = args.out or os.path.join(args.frames_dir, "video.mp4")

    first = cv2.imread(colors[0])
    h, w = first.shape[:2]
    depth0 = colors[0].replace("color_", "depth_")
    side_by_side = os.path.isfile(depth0)
    width = w * 2 if side_by_side else w

    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), args.fps, (width, h)
    )
    for c in colors:
        img = cv2.imread(c)
        d = c.replace("color_", "depth_")
        if side_by_side and os.path.isfile(d):
            img = np.concatenate([img, cv2.imread(d)], axis=1)
        writer.write(img)
    writer.release()
    print("wrote", out_path, f"({len(colors)} frames)")


if __name__ == "__main__":
    main()
