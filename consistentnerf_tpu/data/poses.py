"""Camera pose constructions shared by loaders and render paths.

`pose_spherical` matches the Blender loader's spherical render-path
construction (`load_blender.py:9-35`); `generate_spiral_path` matches the
LLFF spiral (`load_llff.py:178-221` semantics).
"""

from __future__ import annotations

import numpy as np


def _trans_t(t):
    return np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, t], [0, 0, 0, 1]], np.float32
    )


def _rot_phi(phi):
    return np.array(
        [
            [1, 0, 0, 0],
            [0, np.cos(phi), -np.sin(phi), 0],
            [0, np.sin(phi), np.cos(phi), 0],
            [0, 0, 0, 1],
        ],
        np.float32,
    )


def _rot_theta(th):
    return np.array(
        [
            [np.cos(th), 0, -np.sin(th), 0],
            [0, 1, 0, 0],
            [np.sin(th), 0, np.cos(th), 0],
            [0, 0, 0, 1],
        ],
        np.float32,
    )


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """c2w for a camera on a sphere looking at the origin (load_blender.py:30)."""
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta / 180.0 * np.pi) @ c2w
    c2w = (
        np.array(
            [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
            np.float32,
        )
        @ c2w
    )
    return c2w


def spherical_render_poses(n: int = 40, phi: float = -30.0,
                           radius: float = 4.0) -> np.ndarray:
    """The blender 360-degree render path (load_blender.py:125-127)."""
    return np.stack(
        [pose_spherical(angle, phi, radius)
         for angle in np.linspace(-180, 180, n + 1)[:-1]],
        0,
    )


def normalize(x):
    return x / np.linalg.norm(x)


def viewmatrix(z, up, pos):
    """Camera-to-world from forward/up/position (load_llff.py convention)."""
    vec2 = normalize(z)
    vec1_avg = up
    vec0 = normalize(np.cross(vec1_avg, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def poses_avg(poses):
    """Average pose of a [N, 3, 5] LLFF pose stack."""
    hwf = poses[0, :3, -1:]
    center = poses[:, :3, 3].mean(0)
    vec2 = normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return np.concatenate([viewmatrix(vec2, up, center), hwf], 1)


def recenter_poses(poses):
    """Recenter a pose stack about its average pose (load_llff.py:256-268)."""
    poses_ = poses + 0
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    c2w = poses_avg(poses)
    c2w = np.concatenate([c2w[:3, :4], bottom], -2)
    bottom = np.tile(np.reshape(bottom, [1, 1, 4]), [poses.shape[0], 1, 1])
    poses_4 = np.concatenate([poses[:, :3, :4], bottom], -2)

    poses_4 = np.linalg.inv(c2w) @ poses_4
    poses_[:, :3, :4] = poses_4[:, :3, :4]
    return poses_


def generate_spiral_path(
    c2w, up, rads, focal, zdelta, zrate, rots, N, hwf=None
):
    """LLFF spiral render path (load_llff.py:178-199 semantics)."""
    render_poses = []
    rads = np.array(list(rads) + [1.0])
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, N + 1)[:-1]:
        c = np.dot(
            c2w[:3, :4],
            np.array(
                [np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]
            )
            * rads,
        )
        z = normalize(c - np.dot(c2w[:3, :4], np.array([0, 0, -focal, 1.0])))
        pose = viewmatrix(z, up, c)
        if hwf is not None:
            pose = np.concatenate([pose, hwf], 1)
        render_poses.append(pose)
    return np.stack(render_poses, 0)
