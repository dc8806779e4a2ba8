"""Procedural multi-view scene with analytic ground truth.

No datasets ship with this repo, so tests and benchmarks use a synthetic
scene: a lambertian unit sphere at the origin rendered analytically
(ray-sphere intersection). Images are multi-view consistent by
construction and exact depths exist for every pixel — which makes the
scene a ground-truth oracle for the hard-mask reprojection subsystem and a
convergence target for end-to-end training tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from consistentnerf_tpu.data import poses as poses_lib


from consistentnerf_tpu.data.scene import SceneData


@dataclasses.dataclass
class SyntheticScene:
    images: np.ndarray  # [N, H, W, 3] in [0, 1]
    depths: np.ndarray  # [N, H, W] exact depth (0 where no hit)
    poses: np.ndarray  # [N, 3, 4] c2w
    K: np.ndarray  # [3, 3]
    H: int
    W: int
    focal: float
    near: float
    far: float
    mono_disp: np.ndarray  # [N, H, W] synthetic monocular disparity prior
    masks: np.ndarray  # [N, H, W] bool foreground (hit) mask

    def to_scene_data(self, n_test: int = 2,
                      interleave_test: bool = False) -> SceneData:
        n = self.images.shape[0]
        if interleave_test and n_test > 0:
            # Spread test views between train views (fairer novel-view
            # evaluation than holding out one side of the orbit).
            step = max(1, n // n_test)
            i_test = np.arange(step - 1, n, step)[:n_test]
            i_train = np.array([i for i in range(n) if i not in set(i_test)])
        else:
            i_test = np.arange(max(0, n - n_test), n)
            i_train = np.arange(0, max(1, n - n_test))
        return SceneData(
            images=self.images,
            poses=self.poses,
            K=self.K,
            H=self.H,
            W=self.W,
            focal=self.focal,
            near=self.near,
            far=self.far,
            i_train=i_train,
            i_test=i_test,
            i_val=i_test,
            depths=self.depths,
            depth_is_gt=True,  # analytic ray-sphere depth
            masks=self.masks.astype(np.float32),
            mono_disp=self.mono_disp,
        )


# Object layouts: lists of (center, radius, albedo_shift). "sphere" is
# the single centered unit sphere every prior round's POL used; "cluster"
# adds two offset spheres that occlude the big one (and each other) from
# a large fraction of orbit angles — depth discontinuities + occlusion
# boundaries, the regime where RGB-only sparse-view training hallucinates
# floaters and the consistency priors have geometry to disambiguate.
_LAYOUTS = {
    "sphere": [((0.0, 0.0, 0.0), 1.0, 0.0)],
    # Extents stay under 2.0x sphere_radius from the origin so every hit
    # lies inside the scene's [near, far] = radius -/+ 2*sphere_radius.
    "cluster": [
        ((0.0, 0.0, 0.0), 1.0, 0.0),
        ((1.35, 0.5, 0.12), 0.5, 0.35),
        ((-0.9, -1.05, -0.22), 0.45, 0.7),
    ],
}


def _sphere_trace(rays_o, rays_d, radius=1.0, layout="sphere"):
    """Analytic nearest-hit ray trace over the layout's spheres.

    Returns (depth, hit, normal, shift): depth along the *unnormalized*
    ray parameterization (t such that o + t * rays_d hits), the hit
    mask, surface normal of the nearest object, and its albedo shift.
    """
    # All-float32 arithmetic: the single-sphere layout bit-matches the
    # original generator (several toy-scale tests are calibrated on the
    # exact draw-for-draw scene bits).
    d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    best_t = np.full(rays_o.shape[:-1], np.inf, np.float32)
    hit = np.zeros(rays_o.shape[:-1], bool)
    normal = np.zeros_like(d)
    shift = np.zeros(rays_o.shape[:-1], np.float32)
    for center, r, alb in _LAYOUTS[layout]:
        center = np.asarray(center, np.float32) * np.float32(radius)
        r = np.float32(r * radius)
        oc = (rays_o - center).astype(np.float32)
        b = 2.0 * np.sum(oc * d, -1)
        c = np.sum(oc * oc, -1) - r**2
        disc = b * b - 4 * c
        ok = disc > 0
        sqrt_disc = np.sqrt(np.maximum(disc, 0))
        t = (-b - sqrt_disc) / 2.0
        ok = ok & (t > 0) & (t < best_t)
        best_t = np.where(ok, t, best_t).astype(np.float32)
        pts = rays_o + t[..., None] * d
        pc = pts - center
        n = pc / np.maximum(np.linalg.norm(pc, axis=-1, keepdims=True),
                            1e-8)
        normal = np.where(ok[..., None], n, normal)
        shift = np.where(ok, np.float32(alb), shift)
        hit = hit | ok
    t = np.where(hit, best_t, 0.0)
    t_param = t / np.linalg.norm(rays_d, axis=-1)
    return t_param, hit, normal, shift


def _shade(normal, hit, background=1.0, pts=None, texture_freq=0.0,
           shift=None):
    """Color from the surface normal (distinct, smooth, view-consistent).

    With texture_freq > 0, modulate albedo by a procedural pattern of the
    3D hit point — high-frequency, multi-view-consistent content that makes
    novel-view PSNR a meaningful test for high-capacity models. `shift`
    rolls the albedo channels per object so multi-object layouts are
    visually distinct.
    """
    rgb = 0.5 * (normal + 1.0)
    if shift is not None and np.any(shift > 0):
        s = shift[..., None]
        rolled = np.concatenate([rgb[..., 2:], rgb[..., :2]], -1)
        rgb = (1.0 - s) * rgb + s * rolled
    if texture_freq > 0.0 and pts is not None:
        f = float(texture_freq)
        tex = 0.5 + 0.5 * np.sin(f * pts + 2.3 * np.sin(1.7 * f * pts[..., ::-1]))
        rgb = rgb * (0.35 + 0.65 * tex)
    light = np.clip(normal @ np.array([0.48, 0.6, 0.64]), 0.1, 1.0)
    rgb = rgb * light[..., None]
    return np.where(hit[..., None], rgb, background)


def make_scene(
    n_views: int = 8,
    H: int = 64,
    W: int = 64,
    focal: Optional[float] = None,
    radius: float = 4.0,
    sphere_radius: float = 1.0,
    white_background: bool = True,
    seed: int = 0,
    texture_freq: float = 0.0,
    layout: str = "sphere",
) -> SyntheticScene:
    focal = focal or 1.2 * W
    K = np.array(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32
    )
    rng = np.random.RandomState(seed)
    thetas = np.linspace(-180, 180, n_views, endpoint=False)
    phis = -30.0 + rng.uniform(-15, 15, size=n_views)

    images, depths, poses, masks = [], [], [], []
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32),
        indexing="xy",
    )
    dirs_cam = np.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1],
         -np.ones_like(i)], -1
    )
    for theta, phi in zip(thetas, phis):
        c2w = poses_lib.pose_spherical(float(theta), float(phi), radius)[:3, :4]
        rays_d = dirs_cam @ c2w[:3, :3].T
        rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
        t, hit, normal, shift = _sphere_trace(
            rays_o, rays_d, sphere_radius, layout=layout
        )
        d_unit = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        pts = rays_o + (t * np.linalg.norm(rays_d, axis=-1))[..., None] * d_unit
        img = _shade(normal, hit, 1.0 if white_background else 0.0,
                     pts=pts, texture_freq=texture_freq, shift=shift)
        images.append(img.astype(np.float32))
        depths.append(t.astype(np.float32))
        poses.append(c2w.astype(np.float32))
        masks.append(hit)

    depths = np.stack(depths, 0)
    with np.errstate(divide="ignore"):
        mono = np.where(depths > 0, 1.0 / np.maximum(depths, 1e-6), 0.0)

    return SyntheticScene(
        images=np.stack(images, 0),
        depths=depths,
        poses=np.stack(poses, 0),
        K=K,
        H=H,
        W=W,
        focal=float(focal),
        near=radius - 2 * sphere_radius,
        far=radius + 2 * sphere_radius,
        mono_disp=mono.astype(np.float32),
        masks=np.stack(masks, 0),
    )
