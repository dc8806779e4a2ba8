"""Ray generation: pixel->ray, NDC warp, mip radii, and the Rays pytree.

Camera convention matches the reference (OpenGL-style: x right, y up, z
backwards; cf. `nerf-pytorch-master/run_nerf_helpers.py:164-202` and
`RegNeRF/internal/datasets.py` `_generate_rays`): a pixel (i, j) maps to the
camera-frame direction [(i-cx)/fx, -(j-cy)/fy, -1].
"""

from __future__ import annotations

from typing import Optional

import flax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Rays:
    """A bundle of rays. All leaves share leading dims (cf. RegNeRF utils.py:31)."""

    origins: jnp.ndarray  # [..., 3]
    directions: jnp.ndarray  # [..., 3] (not normalized)
    viewdirs: jnp.ndarray  # [..., 3] (normalized directions)
    radii: jnp.ndarray  # [..., 1] base radii for cone casting
    lossmult: jnp.ndarray  # [..., 1]
    near: jnp.ndarray  # [..., 1]
    far: jnp.ndarray  # [..., 1]


def pixel_dirs(H: int, W: int, K) -> jnp.ndarray:
    """Camera-frame direction for every pixel center. Returns [H, W, 3]."""
    K = jnp.asarray(K)
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32),
        indexing="xy",
    )
    return jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)], -1
    )


def get_rays(H: int, W: int, K, c2w) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World-frame (origins, directions) for all pixels of one camera.

    Semantics of `run_nerf_helpers.py:get_rays` (:164-173). Returns two
    [H, W, 3] arrays; directions are unnormalized.
    """
    c2w = jnp.asarray(c2w)
    dirs = pixel_dirs(H, W, K)
    # Rotate camera-frame dirs to world frame: d_w = R @ d_c.
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H, W, focal, near, rays_o, rays_d):
    """Warp rays into NDC space for forward-facing (LLFF) scenes.

    Matches `run_nerf_helpers.py:ndc_rays` (:186-202).
    """
    # Shift ray origins to the near plane.
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    rays_o = jnp.stack([o0, o1, o2], -1)
    rays_d = jnp.stack([d0, d1, d2], -1)
    return rays_o, rays_d


def pixel_radii(directions: jnp.ndarray) -> jnp.ndarray:
    """Cone base radii from the x-spacing of neighbouring pixel directions.

    `directions` is [H, W, 3] (one camera). Matches the mip-NeRF rule used by
    `RegNeRF/internal/datasets.py:_generate_rays`: distance between adjacent
    x-axis pixels, scaled by 2/sqrt(12) (std of a unit-width triangle filter).
    Returns [H, W, 1].
    """
    dx = jnp.sqrt(jnp.sum((directions[:, :-1, :] - directions[:, 1:, :]) ** 2, -1))
    dx = jnp.concatenate([dx, dx[:, -2:-1]], 1)
    return dx[..., None] * 2 / jnp.sqrt(12)


def camera_rays(
    H: int,
    W: int,
    K,
    c2w,
    near: float,
    far: float,
    *,
    use_ndc: bool = False,
    ndc_focal: Optional[float] = None,
) -> Rays:
    """Full Rays bundle for one camera, ready for the renderer. [H, W, ...]."""
    rays_o, rays_d = get_rays(H, W, K, c2w)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    radii = pixel_radii(rays_d)
    if use_ndc:
        focal = ndc_focal if ndc_focal is not None else np.asarray(K)[0, 0]
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
        # Radii in NDC space follow the y-spacing rule on the warped dirs
        # (mip-NeRF 360 convention); recompute from warped directions.
        radii = pixel_radii(rays_d)
    ones = jnp.ones_like(rays_d[..., :1])
    return Rays(
        origins=rays_o,
        directions=rays_d,
        viewdirs=viewdirs,
        radii=radii,
        lossmult=ones,
        near=ones * near,
        far=ones * far,
    )
