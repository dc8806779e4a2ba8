"""Visualization: depth/disparity colormaps, checkerboard matting, image IO.

Covers the reference's vis surface: turbo-colormap depth with checker matte
(`alky/vis_utils.py:88-160`, `RegNeRF/internal/vis.py:57-180`), the
visualize-suite dict (`vis.py:254-299`), and u8 PNG saving.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def save_img_u8(img: np.ndarray, path: str):
    """Save [0,1] float image as u8 PNG (utils.py:save_img_u8)."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = (np.clip(np.nan_to_num(img), 0.0, 1.0) * 255.0).astype(np.uint8)
    Image.fromarray(arr).save(path, "PNG")


def save_img_f32(depthmap: np.ndarray, path: str):
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(np.nan_to_num(depthmap).astype(np.float32)).save(
        path, "TIFF"
    )


def _turbo_colormap(x: np.ndarray) -> np.ndarray:
    """Turbo colormap via matplotlib ('turbo'), x in [0,1] -> rgb."""
    import matplotlib.cm as cm

    return cm.get_cmap("turbo")(np.clip(x, 0, 1))[..., :3]


def weighted_percentile(x, w, ps):
    """Host-side weighted percentile for vis scaling."""
    x = x.reshape(-1)
    w = w.reshape(-1)
    sortidx = np.argsort(x)
    x, w = x[sortidx], w[sortidx]
    acc_w = np.cumsum(w)
    return np.interp(np.array(ps) * (acc_w[-1] / 100), acc_w, x)


def visualize_cmap(
    value: np.ndarray,
    weight: np.ndarray,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    curve_fn=lambda x: x,
    matte_background: bool = True,
    percentile: float = 99.0,
) -> np.ndarray:
    """Colormapped scalar map with accumulation-matte checkerboard
    (RegNeRF vis.py:57-124 semantics)."""
    if lo is None or hi is None:
        lo_auto, hi_auto = weighted_percentile(
            value, weight, [50 - percentile / 2, 50 + percentile / 2]
        )
        lo = lo if lo is not None else lo_auto
        hi = hi if hi is not None else hi_auto
    value = np.clip(value, lo, hi)
    value = curve_fn(value)
    lo_c, hi_c = curve_fn(lo), curve_fn(hi)
    value = (value - np.minimum(lo_c, hi_c)) / np.abs(hi_c - lo_c + 1e-10)
    if hi_c < lo_c:
        value = 1 - value
    colorized = _turbo_colormap(value)
    if matte_background:
        return matte(colorized, weight)
    return colorized


def matte(vis: np.ndarray, acc: np.ndarray, dark=0.8, light=1.0,
          width=8) -> np.ndarray:
    """Checkerboard matte for unaccumulated pixels (vis.py:46-54 style)."""
    h, w = acc.shape[:2]
    bg_mask = np.logical_xor(
        (np.arange(h) % (2 * width) // width)[:, None],
        (np.arange(w) % (2 * width) // width)[None, :],
    )
    bg = np.where(bg_mask, light, dark)[..., None].repeat(3, -1)
    return vis * acc[..., None] + (bg * (1 - acc[..., None]))


def visualize_depth(depth: np.ndarray, acc: Optional[np.ndarray] = None,
                    lo=None, hi=None) -> np.ndarray:
    """Turbo depth visualization (lky_visualize_depth, vis_utils.py:145)."""
    acc = acc if acc is not None else np.ones_like(depth)
    eps = np.finfo(np.float32).eps
    return visualize_cmap(
        1.0 / np.maximum(depth, eps),
        acc,
        lo=lo,
        hi=hi,
        curve_fn=lambda x: np.log(x + eps),
    )


def visualize_normals(normals: np.ndarray, acc: Optional[np.ndarray] = None):
    """Map unit normals to rgb (vis.py matched convention)."""
    vis = (normals + 1.0) / 2.0
    if acc is not None:
        vis = matte(vis, acc)
    return vis


def visualize_rays(
    t_vals: np.ndarray,
    weights: np.ndarray,
    rgbs: Optional[np.ndarray] = None,
    width: int = 640,
    height: int = 320,
) -> np.ndarray:
    """Ray-bundle visualization: per-ray weight curves over distance.

    The analog of RegNeRF's vis.py:185-251 matplotlib ray plots, consuming
    the `ray_t_vals`/`ray_weights`/`ray_rgbs` bundles emitted by
    `volumetric_rendering(compute_extras=True)`. Returns an RGB image in
    [0, 1].
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t_vals = np.asarray(t_vals)
    weights = np.asarray(weights)
    fig, ax = plt.subplots(
        figsize=(width / 100, height / 100), dpi=100
    )
    t_mids = 0.5 * (t_vals[:, :-1] + t_vals[:, 1:])
    for i in range(min(t_mids.shape[0], 64)):
        color = None
        if rgbs is not None:
            color = np.clip(np.asarray(rgbs)[i].mean(0), 0, 1)
        ax.plot(t_mids[i], weights[i][: t_mids.shape[1]], lw=0.7,
                alpha=0.6, color=color)
    ax.set_xlabel("distance")
    ax.set_ylabel("weight")
    fig.tight_layout()
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf.astype(np.float32) / 255.0


def visualize_suite(rendering: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """The standard visualization bundle (RegNeRF vis.py:254-299)."""
    out = {"color": np.clip(rendering["rgb"], 0, 1)}
    acc = rendering.get("acc", np.ones(rendering["rgb"].shape[:2]))
    if "depth" in rendering:
        out["depth"] = visualize_depth(rendering["depth"], acc)
    if "disp" in rendering:
        out["disp"] = visualize_cmap(rendering["disp"], acc)
    if "normals" in rendering:
        out["normals"] = visualize_normals(rendering["normals"], acc)
    out["acc"] = np.repeat(np.clip(acc, 0, 1)[..., None], 3, -1)
    return out
