"""Tests for ray generation against an independent torch/numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.core import rays as rays_core


def _oracle_get_rays_np(H, W, K, c2w):
    """Independent numpy reimplementation of the pixel->ray convention."""
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32),
        indexing="xy",
    )
    dirs = np.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -np.ones_like(i)], -1
    )
    rays_d = np.sum(dirs[..., np.newaxis, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def _random_pose(seed):
    rng = np.random.RandomState(seed)
    # Random rotation via QR.
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.randn(3) * 2
    c2w = np.concatenate([q, t[:, None]], 1).astype(np.float32)
    return c2w


def test_get_rays_matches_reference_convention():
    H, W = 12, 16
    focal = 20.0
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]],
                 np.float32)
    c2w = _random_pose(0)
    o_ref, d_ref = _oracle_get_rays_np(H, W, K, c2w)
    o, d = rays_core.get_rays(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(o), o_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-5)


def test_center_pixel_looks_down_minus_z():
    H = W = 8
    K = np.array([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    _, d = rays_core.get_rays(H, W, K, c2w)
    # pixel (4, 4) has dir exactly (0, 0, -1) with identity pose
    np.testing.assert_allclose(np.asarray(d)[4, 4], [0, 0, -1], atol=1e-6)


def test_ndc_rays_z_range():
    """NDC maps [near, inf) along the ray to o2+t*d2 in [-1, 1]."""
    H, W, focal = 12, 16, 20.0
    K = np.array([[focal, 0, 8.0], [0, focal, 6.0], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    o, d = rays_core.get_rays(H, W, K, c2w)
    no, nd = rays_core.ndc_rays(H, W, focal, 1.0, o, d)
    no = np.asarray(no)
    nd = np.asarray(nd)
    # At t=0 (the near plane), z = 1 + 2*near/rays_o_z where rays_o_z = -near
    # => z = -1. At t=1, z -> -1 + d2 -> +1 - ... tends to 1 as t->1.
    np.testing.assert_allclose(no[..., 2], -1.0, atol=1e-5)
    np.testing.assert_allclose(no[..., 2] + nd[..., 2], 1.0, atol=1e-4)


def test_pixel_radii_shape_and_scale():
    H, W, focal = 10, 14, 25.0
    K = np.array([[focal, 0, 7.0], [0, focal, 5.0], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    _, d = rays_core.get_rays(H, W, K, c2w)
    radii = np.asarray(rays_core.pixel_radii(d))
    assert radii.shape == (H, W, 1)
    # Adjacent pixel dirs differ by 1/focal in x -> radius ~ (1/focal)*2/sqrt(12)
    expected = (1.0 / focal) * 2 / np.sqrt(12)
    np.testing.assert_allclose(radii, expected, rtol=1e-5)


def test_camera_rays_bundle():
    H, W, focal = 6, 8, 10.0
    K = np.array([[focal, 0, 4.0], [0, focal, 3.0], [0, 0, 1]], np.float32)
    c2w = _random_pose(3)
    bundle = rays_core.camera_rays(H, W, K, c2w, near=2.0, far=6.0)
    assert bundle.origins.shape == (H, W, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(bundle.viewdirs), axis=-1), 1.0, atol=1e-5
    )
    assert float(bundle.near[0, 0, 0]) == 2.0
    assert float(bundle.far[0, 0, 0]) == 6.0


@pytest.mark.parametrize("seed", [0, 1])
def test_get_rays_matches_torch_reference(seed):
    """Cross-check against torch's broadcasting semantics (reference oracle)."""
    torch = pytest.importorskip("torch")
    H, W, focal = 9, 11, 15.0
    K = np.array([[focal, 0, 5.5], [0, focal, 4.5], [0, 0, 1]], np.float32)
    c2w = _random_pose(seed)

    i, j = torch.meshgrid(
        torch.linspace(0, W - 1, W), torch.linspace(0, H - 1, H), indexing="ij"
    )
    i, j = i.t(), j.t()
    dirs = torch.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1],
         -torch.ones_like(i)], -1
    )
    c2w_t = torch.tensor(c2w)
    rays_d_t = torch.sum(dirs[..., None, :] * c2w_t[:3, :3], -1)
    rays_o_t = c2w_t[:3, -1].expand(rays_d_t.shape)

    o, d = rays_core.get_rays(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(d), rays_d_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o), rays_o_t.numpy(), atol=1e-5)
