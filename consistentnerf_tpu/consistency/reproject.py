"""On-device multi-view reprojection and hard-mask generation.

The reference computes its 3D-consistency "hard masks" with a CPU+GPU hybrid
triple loop over (target view, reference view, 5120-pixel chunk) with a
data-dependent occlusion-threshold-doubling while-loop
(`run_nerf_view.py:994-1055`, `RegNeRF/internal/mask_utils/mask_generator.py:
147-313`). Here the whole computation is a single jitted program:

* pixels lift to 3D via the MVS depth prior,
* project into every other training view (including the reference's
  y/z-flip camera-convention transform, run_nerf_view.py:596),
* the occlusion threshold doubling is replaced by an equivalent *closed form*
  (smallest tau0*2^k exceeding the per-chunk minimum |depth diff|), which is
  fully vectorized — no data-dependent control flow, same masks.

The per-chunk granularity (5120 pixels) of the reference's threshold search
is preserved so masks match bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from consistentnerf_tpu.core import rays as rays_core

CHUNK = 5120  # reference chunk size (run_nerf_view.py:1014)

# OpenGL camera (y up, z back) -> projection convention (y down, z forward).
_FLIP_YZ = np.diag(np.array([1.0, -1.0, -1.0], np.float32))


def world_to_ref_pixels(points_w: jnp.ndarray, w2c_ref: jnp.ndarray,
                        K: jnp.ndarray, H: int, W: int):
    """Project world points into a reference camera.

    points_w: [N, 3]. w2c_ref: [4, 4] (or [3, 4]). Returns
    (x, y, z_ref, in_bounds): rounded integer pixel coordinates (as float),
    depth in the ref camera (after y/z flip, so positive in front), and the
    strict-interior bounds mask (borders excluded, matching
    run_nerf_view.py:611-613).
    """
    R = w2c_ref[:3, :3]
    T = w2c_ref[:3, 3]
    p_cam = (points_w @ R.T + T) @ jnp.asarray(_FLIP_YZ)
    p_pix = p_cam @ jnp.asarray(K, p_cam.dtype).T
    x = jnp.round(p_pix[..., 0] / p_pix[..., 2])
    y = jnp.round(p_pix[..., 1] / p_pix[..., 2])
    x_norm = x / (W - 1)
    y_norm = y / (H - 1)
    in_bounds = (
        (x_norm > 0.0) & (x_norm < 1.0) & (y_norm > 0.0) & (y_norm < 1.0)
    )
    return x, y, p_cam[..., 2], in_bounds


def _effective_threshold(min_diff: jnp.ndarray, tau0: float) -> jnp.ndarray:
    """Smallest tau0 * 2^k (k >= 0) strictly greater than min_diff.

    Closed form of the reference's doubling loop
    (run_nerf_view.py:1026-1029): start at tau0, double until at least one
    pixel satisfies |diff| < tau.
    """
    ratio = jnp.maximum(min_diff / tau0, jnp.finfo(jnp.float32).tiny)
    k = jnp.maximum(0.0, jnp.floor(jnp.log2(ratio)) + 1.0)
    # Guard: if min_diff < tau0 already passes, k must be 0.
    k = jnp.where(min_diff < tau0, 0.0, k)
    return tau0 * jnp.exp2(k)


def consistency_mask_pair(
    points_w: jnp.ndarray,
    w2c_ref: jnp.ndarray,
    ref_depth: jnp.ndarray,
    K: jnp.ndarray,
    occlusion_threshold: float = 0.1,
    chunk: int = CHUNK,
) -> jnp.ndarray:
    """Per-pixel consistency mask of target pixels against one ref view.

    points_w: [P, 3] world points (P = H*W of the target view, possibly
    padded to a multiple of `chunk`). ref_depth: [H, W] MVS depth of the
    reference view. Returns bool [P].
    """
    H, W = ref_depth.shape
    P = points_w.shape[0]
    pad = (-P) % chunk
    valid = jnp.ones((P,), bool)
    if pad:
        points_w = jnp.concatenate(
            [points_w, jnp.zeros((pad, 3), points_w.dtype)], 0
        )
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], 0)

    x, y, z_ref, in_bounds = world_to_ref_pixels(points_w, w2c_ref, K, H, W)
    in_bounds = in_bounds & valid  # padded tail must not affect the search

    xi = jnp.clip(x, 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(y, 0, H - 1).astype(jnp.int32)
    d_ref = ref_depth[yi, xi]

    depth_diff = jnp.abs(z_ref - d_ref)
    # Invalid (out-of-bounds) pixels must not drive the threshold search.
    diff_for_min = jnp.where(in_bounds, depth_diff, jnp.inf)

    nchunks = points_w.shape[0] // chunk
    diff_c = diff_for_min.reshape(nchunks, chunk)
    in_bounds_c = in_bounds.reshape(nchunks, chunk)

    min_diff = jnp.min(diff_c, axis=1)  # [nchunks]
    any_valid = jnp.any(in_bounds_c, axis=1)
    tau = _effective_threshold(min_diff, occlusion_threshold)  # [nchunks]

    mask_c = in_bounds_c & (diff_c < tau[:, None]) & any_valid[:, None]
    mask = mask_c.reshape(-1)
    if pad:
        mask = mask[:P]
    return mask


@functools.partial(jax.jit, static_argnames=("H", "W", "occlusion_threshold",
                                             "chunk"))
def hard_mask_for_target(
    tgt_pose: jnp.ndarray,
    tgt_depth: jnp.ndarray,
    ref_poses: jnp.ndarray,
    ref_depths: jnp.ndarray,
    K: jnp.ndarray,
    H: int,
    W: int,
    occlusion_threshold: float = 0.1,
    chunk: int = CHUNK,
) -> jnp.ndarray:
    """Hard mask of one target view against a stack of reference views.

    tgt_pose: [3, 4] c2w; tgt_depth: [H, W]; ref_poses: [R, 3, 4];
    ref_depths: [R, H, W]. Returns bool [H, W] — the union (OR) over
    reference views, as in run_nerf_view.py:1041 (mask_tgt += mask_mid).
    """
    rays_o, rays_d = rays_core.get_rays(H, W, K, tgt_pose)
    points_w = (
        rays_o.reshape(-1, 3)
        + tgt_depth.reshape(-1, 1) * rays_d.reshape(-1, 3)
    )

    def per_ref(ref_pose, ref_depth):
        c2w = jnp.eye(4).at[:3, :4].set(ref_pose)
        w2c = jnp.linalg.inv(c2w)
        return consistency_mask_pair(
            points_w, w2c, ref_depth, K, occlusion_threshold, chunk
        )

    masks = jax.vmap(per_ref)(ref_poses, ref_depths)  # [R, H*W]
    return jnp.any(masks, axis=0).reshape(H, W)


@functools.partial(jax.jit, static_argnames=("H", "W", "threshold",
                                              "min_consensus"))
def fused_depth_for_target(
    tgt_pose: jnp.ndarray,
    tgt_depth: jnp.ndarray,
    ref_poses: jnp.ndarray,
    ref_depths: jnp.ndarray,
    K: jnp.ndarray,
    H: int,
    W: int,
    threshold: float = 0.1,
    min_consensus: int = 1,
) -> jnp.ndarray:
    """Cross-view occlusion-tested depth fusion for one target view.

    The same geometric test the reference applies at mask time
    (mask_generator.py:284-297 / run_nerf_view.py:1014-1046), applied at
    PRIOR time, MVSNet-fusion style: lift each target pixel through its
    candidate depth, check the point against every reference view's
    depth map (|z_in_ref - ref_depth| < threshold), re-lift the
    reference's estimate and read its depth along the target ray. Pixels
    confirmed by >= min_consensus other views keep the MEAN of the
    agreeing estimates (noise reduction); unconfirmed pixels drop to
    zero-depth = "no prior" (the MVS PFMs' background convention), so
    downstream masks and the depth loss ignore them.

    tgt_pose/ref_poses: [3,4] / [R,3,4] c2w; depths z-convention as in
    consistency_mask_pair. Returns [H, W] fused depth.
    """
    rays_o, rays_d = rays_core.get_rays(H, W, K, tgt_pose)
    d_t = tgt_depth.reshape(-1)
    points_w = (
        rays_o.reshape(-1, 3) + d_t[:, None] * rays_d.reshape(-1, 3)
    )
    c2w_t = jnp.eye(4).at[:3, :4].set(tgt_pose)
    w2c_t = jnp.linalg.inv(c2w_t)

    def per_ref(ref_pose, ref_depth):
        c2w_r = jnp.eye(4).at[:3, :4].set(ref_pose)
        w2c_r = jnp.linalg.inv(c2w_r)
        x, y, z_ref, inb = world_to_ref_pixels(points_w, w2c_r, K, H, W)
        xi = jnp.clip(x, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(y, 0, H - 1).astype(jnp.int32)
        d_ref = ref_depth[yi, xi]
        consistent = inb & (d_ref > 0) & (
            jnp.abs(z_ref - d_ref) < threshold
        )
        # Re-lift the reference's own estimate of the surface and read
        # its depth along the TARGET ray (z in the target camera).
        ro_r, rd_r = rays_core.get_rays(H, W, K, ref_pose)
        ro_r = ro_r.reshape(-1, 3)[yi * W + xi]
        rd_r = rd_r.reshape(-1, 3)[yi * W + xi]
        x_back = ro_r + d_ref[:, None] * rd_r
        _, _, z_t, _ = world_to_ref_pixels(x_back, w2c_t, K, H, W)
        consistent = consistent & (z_t > 0)
        return consistent, jnp.where(consistent, z_t, 0.0)

    consistent, estimates = jax.vmap(per_ref)(ref_poses, ref_depths)
    votes = jnp.sum(consistent, axis=0)  # [H*W]
    keep = (d_t > 0) & (votes >= min_consensus)
    fused = (d_t + jnp.sum(estimates, axis=0)) / (1.0 + votes)
    return jnp.where(keep, fused, 0.0).reshape(H, W)


def fuse_depth_priors(
    poses: np.ndarray,
    depths: np.ndarray,
    K: np.ndarray,
    i_train: np.ndarray,
    H: int,
    W: int,
    threshold: float = 0.1,
    min_consensus: int = 1,
) -> np.ndarray:
    """Occlusion-tested consensus fusion of per-view depth priors
    (fused_depth_for_target over every train view; zeros elsewhere)."""
    poses = np.asarray(poses)[:, :3, :4].astype(np.float32)
    depths = np.asarray(depths).astype(np.float32)
    i_train = np.asarray(i_train)
    out = np.zeros_like(depths)
    for tgt in i_train:
        refs = np.array([r for r in i_train if r != tgt])
        if refs.size == 0:
            out[tgt] = depths[tgt]
            continue
        out[tgt] = np.asarray(
            fused_depth_for_target(
                jnp.asarray(poses[tgt]),
                jnp.asarray(depths[tgt]),
                jnp.asarray(poses[refs]),
                jnp.asarray(depths[refs]),
                jnp.asarray(K, jnp.float32),
                H, W, threshold, min_consensus,
            )
        )
    return out


def compute_hard_masks(
    poses: np.ndarray,
    depths: np.ndarray,
    K: np.ndarray,
    i_train: np.ndarray,
    H: int,
    W: int,
    occlusion_threshold: float = 0.1,
    chunk: int = CHUNK,
) -> np.ndarray:
    """Hard masks for all views (zeros for non-train views).

    poses: [N, 3, 4] (or [N, 4, 4]); depths: [N, H, W] MVS depth priors.
    Equivalent of the mask-generation loop at run_nerf_view.py:994-1046 /
    mask_generator.get_hard_masks, but each target is one jitted device
    program. Returns bool [N, H, W].
    """
    poses = np.asarray(poses)[:, :3, :4].astype(np.float32)
    depths = np.asarray(depths).astype(np.float32)
    i_train = np.asarray(i_train)
    n = poses.shape[0]

    masks = np.zeros((n, H, W), dtype=bool)
    for tgt in i_train:
        refs = np.array([r for r in i_train if r != tgt])
        if refs.size == 0:
            continue
        masks[tgt] = np.asarray(
            hard_mask_for_target(
                jnp.asarray(poses[tgt]),
                jnp.asarray(depths[tgt]),
                jnp.asarray(poses[refs]),
                jnp.asarray(depths[refs]),
                jnp.asarray(K, jnp.float32),
                H,
                W,
                occlusion_threshold,
                chunk,
            )
        )
    return masks
