"""Learned multi-view-stereo depth-prior network (plane-sweep MVS).

The reference bootstraps its consistency priors from an EXTERNAL
pretrained MVSNeRF checkpoint run out-of-repo: `renderer-copy.ipynb`
(cell 1, `root='/home/.../mvsnerf'`) writes `nerf_*_data_depth/
depth_%04d.pfm` files that the loaders then consume
(`nerf-pytorch-master/load_blender.py:130-223`, `load_dtu.py:171`).
That producer cannot ship (external repo + weights, dangling symlinks in
the reference tree), so this module is the in-framework equivalent: a
compact plane-sweep MVS depth network of the MVSNet family — 2D feature
extractor -> homography-warped variance cost volume -> 3D cost
regularization -> soft-argmin depth -> 2D refinement — trainable per
scene either supervised (GT depth, as DTU provides) or self-supervised
(photometric warp loss), so a fresh scene can produce depth priors
without any external checkpoint.

TPU-first design notes:
* every stage is one static-shape jitted program — no Python loop over
  depth planes; the plane sweep is a single batched bilinear gather over
  all D hypotheses at once,
* convs are NHWC / DHWC (XLA tiles them onto the MXU),
* compute dtype is configurable (bf16 matmuls with fp32 params) like the
  rest of the framework,
* the camera model is the repo's OpenGL-style convention — the warp
  reuses the exact y/z-flip projection of `consistency/reproject.py`
  (run_nerf_view.py:596 semantics), so MVS depths are directly valid as
  inputs to the hard-mask generator and depth losses.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# OpenGL camera (y up, z back) -> projection convention (y down, z
# forward) — identical to consistency/reproject.py so depths interoperate.
_FLIP_YZ = np.diag(np.array([1.0, -1.0, -1.0], np.float32))


# ---------------------------------------------------------------------------
# Geometry: plane-sweep warp in the repo camera convention
# ---------------------------------------------------------------------------


def scale_K(K: jnp.ndarray, sx: float, sy: float | None = None
            ) -> jnp.ndarray:
    """Intrinsics for an image resampled by sx (width) / sy (height).

    Anisotropic so non-multiple-of-4 image sizes (LLFF 378x504 at
    factor 8) stay geometrically exact at the ceil-divided feature
    resolution of the stride-2 convs.

    The principal point uses the pixel-center convention: pixel u in the
    downsampled image is centered at continuous coordinate
    (u + 0.5)/s - 0.5 of the source, so cx' = (cx + 0.5)*sx - 0.5 (the
    raw cx*sx carries a systematic (1-sx)/2-px shift — ~0.375 px at the
    1/4-res cost volume; ADVICE r4).
    """
    sy = sx if sy is None else sy
    K = jnp.asarray(K)
    return jnp.array(
        [
            [K[0, 0] * sx, 0.0, (K[0, 2] + 0.5) * sx - 0.5],
            [0.0, K[1, 1] * sy, (K[1, 2] + 0.5) * sy - 0.5],
            [0.0, 0.0, 1.0],
        ],
        K.dtype,
    )


# One camera convention, one implementation: the cost-volume warp MUST
# agree with core/rays.py::get_rays (x right, y up, looking down -z;
# depth parameterized along the UNNORMALIZED directions) or depths stop
# interoperating with the renderer — import rather than duplicate.
from consistentnerf_tpu.core.rays import pixel_dirs  # noqa: E402,F401


def project_to_pixels(points_w: jnp.ndarray, c2w_src: jnp.ndarray,
                      K: jnp.ndarray, H: int, W: int):
    """Project world points into a source camera (continuous coords).

    points_w: [..., 3]. Returns (x, y, z, valid): float pixel coordinates,
    source-camera depth (positive in front after the y/z flip), and the
    in-frustum mask. The continuous (un-rounded) analog of
    reproject.world_to_ref_pixels — sub-pixel coords feed the bilinear
    warp instead of a nearest-neighbor depth lookup.
    """
    c2w4 = jnp.eye(4, dtype=jnp.float32).at[:3, :4].set(c2w_src[:3, :4])
    w2c = jnp.linalg.inv(c2w4)
    R, T = w2c[:3, :3], w2c[:3, 3]
    p_cam = (points_w @ R.T + T) @ jnp.asarray(_FLIP_YZ)
    z = p_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    x = K[0, 0] * p_cam[..., 0] / zs + K[0, 2]
    y = K[1, 1] * p_cam[..., 1] / zs + K[1, 2]
    valid = (z > 1e-4) & (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    return x, y, z, valid


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                    ) -> jnp.ndarray:
    """Bilinearly sample img [H, W, C] at float coords x/y [...] -> [..., C].

    One flattened gather per corner (4 total) — the TPU-friendly shape:
    a single large take() instead of per-pixel dynamic slices.
    """
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    flat = img.reshape(-1, img.shape[-1])

    def at(yy, xx):
        idx = (yy * W + xx).astype(jnp.int32)
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            idx.shape + (img.shape[-1],)
        )

    top = at(y0, x0) * (1 - wx) + at(y0, x1) * wx
    bot = at(y1, x0) * (1 - wx) + at(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def plane_sweep_warp(
    src_feat: jnp.ndarray,
    c2w_ref: jnp.ndarray,
    c2w_src: jnp.ndarray,
    K: jnp.ndarray,
    depth_values: jnp.ndarray,
    H: int,
    W: int,
):
    """Warp one source feature map onto fronto-parallel ref depth planes.

    src_feat: [H, W, C] (at the same scale K describes). depth_values:
    [D]. Returns (warped [D, H, W, C], valid [D, H, W]). All D planes in
    ONE gather — the grid of world points is [D, H, W, 3] and the
    bilinear sample batches over it.
    """
    dirs = pixel_dirs(H, W, K)  # [H, W, 3] camera space
    dirs_w = dirs @ c2w_ref[:3, :3].T  # rotate to world
    origin = c2w_ref[:3, 3]
    # [D, H, W, 3]: lift every pixel through every depth hypothesis.
    pts = origin + depth_values[:, None, None, None] * dirs_w[None]
    x, y, _, valid = project_to_pixels(pts, c2w_src, K, H, W)
    warped = bilinear_sample(src_feat, x, y)
    return warped * valid[..., None].astype(warped.dtype), valid


def warp_src_to_ref(
    src_img: jnp.ndarray,
    depth_ref: jnp.ndarray,
    c2w_ref: jnp.ndarray,
    c2w_src: jnp.ndarray,
    K: jnp.ndarray,
):
    """Warp a source image into the ref view via a per-pixel ref depth map.

    src_img: [H, W, C]; depth_ref: [H, W]. Returns (warped [H, W, C],
    valid [H, W]). The photometric self-supervision term and the warp
    oracle test both use this.
    """
    H, W = depth_ref.shape
    dirs_w = pixel_dirs(H, W, K) @ c2w_ref[:3, :3].T
    pts = c2w_ref[:3, 3] + depth_ref[..., None] * dirs_w
    x, y, _, valid = project_to_pixels(pts, c2w_src, K, H, W)
    valid = valid & (depth_ref > 0)
    return bilinear_sample(src_img, x, y) * valid[..., None], valid


# ---------------------------------------------------------------------------
# Networks
# ---------------------------------------------------------------------------


class FeatureNet2D(nn.Module):
    """2D feature pyramid: full-res image -> 1/4-res C-channel features."""

    base_ch: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        conv = functools.partial(nn.Conv, dtype=self.dtype, padding="SAME")
        h = img.astype(self.dtype)
        c = self.base_ch
        h = nn.relu(conv(c, (3, 3))(h))
        h = nn.relu(conv(c, (3, 3))(h))
        h = nn.relu(conv(2 * c, (5, 5), strides=(2, 2))(h))
        h = nn.relu(conv(2 * c, (3, 3))(h))
        h = nn.relu(conv(4 * c, (5, 5), strides=(2, 2))(h))
        h = nn.relu(conv(4 * c, (3, 3))(h))
        return conv(4 * c, (3, 3))(h)


class CostRegNet3D(nn.Module):
    """3D U-Net over the [D, H, W, C] cost volume -> per-voxel score."""

    base_ch: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vol: jnp.ndarray) -> jnp.ndarray:
        conv = functools.partial(nn.Conv, dtype=self.dtype, padding="SAME")
        up = functools.partial(
            nn.ConvTranspose, dtype=self.dtype, padding="SAME"
        )
        c = self.base_ch
        x0 = nn.relu(conv(c, (3, 3, 3))(vol.astype(self.dtype)))
        x1 = nn.relu(conv(2 * c, (3, 3, 3), strides=(2, 2, 2))(x0))
        x1 = nn.relu(conv(2 * c, (3, 3, 3))(x1))
        x2 = nn.relu(conv(4 * c, (3, 3, 3), strides=(2, 2, 2))(x1))
        x2 = nn.relu(conv(4 * c, (3, 3, 3))(x2))
        y1 = nn.relu(up(2 * c, (3, 3, 3), strides=(2, 2, 2))(x2))
        y1 = _crop_like(y1, x1) + x1
        y0 = nn.relu(up(c, (3, 3, 3), strides=(2, 2, 2))(y1))
        y0 = _crop_like(y0, x0) + x0
        return conv(1, (3, 3, 3))(y0)[..., 0]  # [D, H, W]


def _crop_like(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Crop a transpose-conv output to the skip connection's shape (odd
    input sizes round up under stride 2)."""
    return x[tuple(slice(0, s) for s in ref.shape)]


class RefineNet2D(nn.Module):
    """Full-res residual refinement of the upsampled coarse depth,
    conditioned on the reference image (MVSNet's refinement head)."""

    base_ch: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        conv = functools.partial(nn.Conv, dtype=self.dtype, padding="SAME")
        h = jnp.concatenate(
            [img.astype(self.dtype), depth[..., None].astype(self.dtype)], -1
        )
        c = self.base_ch
        h = nn.relu(conv(c, (3, 3))(h))
        h = nn.relu(conv(c, (3, 3))(h))
        h = nn.relu(conv(c, (3, 3))(h))
        res = conv(1, (3, 3))(h)[..., 0]
        return depth + res.astype(depth.dtype)


class MVSDepthNet(nn.Module):
    """Plane-sweep MVS: ref + source views -> ref depth map + confidence.

    Matches the producer role of the reference's external MVSNeRF (depth
    PFM emitter), not its NeRF-rendering branch: the consistency
    subsystem only ever consumes the depth maps (run_nerf_view.py:1015,
    load_dtu.py:171).
    """

    num_depths: int = 32
    base_ch: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        ref_img: jnp.ndarray,  # [H, W, 3]
        src_imgs: jnp.ndarray,  # [V, H, W, 3]
        c2w_ref: jnp.ndarray,  # [3, 4]
        c2w_srcs: jnp.ndarray,  # [V, 3, 4]
        K: jnp.ndarray,  # [3, 3] full-res intrinsics
        near: float,
        far: float,
    ):
        H, W = ref_img.shape[0], ref_img.shape[1]
        feat = FeatureNet2D(self.base_ch, self.dtype, name="feature")
        f_ref = feat(ref_img)  # [Hr, Wr, C]
        f_srcs = jax.vmap(feat)(src_imgs)  # [V, Hr, Wr, C]
        Hr, Wr = f_ref.shape[0], f_ref.shape[1]  # ceil(H/4), ceil(W/4)
        Kr = scale_K(K, Wr / W, Hr / H)

        # Depth hypotheses: linear in depth across [near, far] (the
        # producer regime is bounded object scenes — DTU/blender).
        d_values = near + (far - near) * (
            jnp.arange(self.num_depths, dtype=jnp.float32) + 0.5
        ) / self.num_depths

        # Warp every source feature map onto every hypothesis plane —
        # one gather per view, vmapped over views.
        def warp_one(f_src, c2w_src):
            return plane_sweep_warp(
                f_src, c2w_ref, c2w_src, Kr, d_values, Hr, Wr
            )

        warped, valid = jax.vmap(warp_one)(f_srcs, c2w_srcs)
        # warped: [V, D, Hr, Wr, C]; valid: [V, D, Hr, Wr]

        # Visibility-weighted variance cost over {ref} ∪ {warped srcs}.
        w = valid[..., None].astype(warped.dtype)  # [V, D, Hr, Wr, 1]
        f_ref_b = f_ref[None]  # ref participates at every plane, weight 1
        tot_w = 1.0 + jnp.sum(w, 0)  # [D, Hr, Wr, 1]
        mean = (f_ref_b + jnp.sum(warped * w, 0)) / tot_w
        sq = (f_ref_b**2 + jnp.sum(warped**2 * w, 0)) / tot_w
        cost = sq - mean**2  # [D, Hr, Wr, C]

        score = CostRegNet3D(self.base_ch, self.dtype, name="cost_reg")(cost)
        prob = jax.nn.softmax(-score.astype(jnp.float32), axis=0)
        depth_lo = jnp.sum(prob * d_values[:, None, None], 0)  # [Hr, Wr]

        # Confidence: probability mass in a 4-hypothesis window around
        # the soft-argmin (MVSNet's photometric confidence).
        idx = jnp.clip(
            jnp.sum(prob * jnp.arange(self.num_depths)[:, None, None], 0),
            0,
            self.num_depths - 1,
        )
        offs = jnp.arange(self.num_depths)[:, None, None] - idx[None]
        window = (jnp.abs(offs) <= 1.5).astype(prob.dtype)
        conf_lo = jnp.sum(prob * window, 0)  # [Hr, Wr]

        depth_up = jax.image.resize(depth_lo, (H, W), "bilinear")
        conf = jax.image.resize(conf_lo, (H, W), "bilinear")
        depth = RefineNet2D(2 * self.base_ch, self.dtype, name="refine")(
            ref_img, depth_up
        )
        depth = jnp.clip(depth, near, far)
        return {
            "depth": depth,
            "depth_lo": depth_lo,
            "conf": conf,
            "prob": prob,
            "depth_values": d_values,
        }


def select_source_views(poses: np.ndarray, i_train: Sequence[int],
                        ref: int, n_src: int) -> np.ndarray:
    """The n_src train views whose camera centers are nearest to `ref`'s
    (excluding itself) — the pair-selection rule the view-variant loaders
    use for reprojection partners."""
    poses = np.asarray(poses)
    centers = poses[:, :3, 3]
    cand = np.array([v for v in i_train if v != ref])
    d = np.linalg.norm(centers[cand] - centers[ref], axis=-1)
    return cand[np.argsort(d)[:n_src]]
