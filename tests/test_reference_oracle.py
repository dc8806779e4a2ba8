"""In-process oracle tests against the actual reference implementation.

The torch reference at /root/reference is importable in this image; these
tests pin our loader/pose/ray/sampling/mask math to the reference's actual
behavior on shared random fixtures (not hand-traced goldens). The
reference is treated as read-only data — only pure functions are called;
no shell/daemon code executes.
"""

import sys
import types

import numpy as np
import pytest

# Stub ipdb (the reference leaves live set_trace imports in its loaders;
# the breakpoint lines themselves are never reached).
sys.modules.setdefault(
    "ipdb", types.SimpleNamespace(set_trace=lambda: None)
)
REF_PT = "/root/reference/nerf-pytorch-master"
REF_RN = "/root/reference/RegNeRF"
for p in (REF_PT, REF_RN):
    if p not in sys.path:
        sys.path.append(p)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from consistentnerf_tpu.core import encoding, rays as rays_core  # noqa: E402
from consistentnerf_tpu.core import sampling  # noqa: E402
from consistentnerf_tpu.consistency import reproject  # noqa: E402
from consistentnerf_tpu.data import poses as poses_lib  # noqa: E402


def _rand_c2w(seed=0):
    rng = np.random.RandomState(seed)
    # A plausible camera: orthonormal rotation + offset translation.
    q = rng.normal(size=(3, 3))
    u, _, vt = np.linalg.svd(q)
    R = (u @ vt).astype(np.float32)
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    t = rng.normal(scale=2.0, size=(3, 1)).astype(np.float32)
    return np.concatenate([R, t], axis=1)


def test_get_rays_matches_reference():
    import run_nerf_helpers as rh

    H, W = 12, 17
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = _rand_c2w(3)
    ro_t, rd_t = rh.get_rays(H, W, torch.tensor(K), torch.tensor(c2w))
    ro_j, rd_j = rays_core.get_rays(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro_j), ro_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd_j), rd_t.numpy(), atol=1e-5)


def test_ndc_rays_matches_reference():
    import run_nerf_helpers as rh

    H, W, focal = 24, 32, 30.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = _rand_c2w(5)
    c2w[:, 3] = [0.1, -0.2, 1.5]  # camera looking along -z-ish
    ro, rd = rays_core.get_rays(H, W, K, c2w)
    ro_t, rd_t = rh.ndc_rays(
        H, W, focal, 1.0,
        torch.tensor(np.asarray(ro)), torch.tensor(np.asarray(rd)),
    )
    ro_j, rd_j = rays_core.ndc_rays(H, W, focal, 1.0, ro, rd)
    np.testing.assert_allclose(np.asarray(ro_j), ro_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd_j), rd_t.numpy(), atol=1e-5)


def test_sample_pdf_matches_reference_det():
    import run_nerf_helpers as rh

    rng = np.random.RandomState(11)
    bins = np.sort(rng.uniform(0, 6, size=(40, 63)), axis=-1).astype(
        np.float32
    )
    weights = rng.uniform(0, 1, size=(40, 62)).astype(np.float32)
    ref = rh.sample_pdf(
        torch.tensor(bins), torch.tensor(weights), 128, det=True
    ).numpy()
    got = np.asarray(
        sampling.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 128,
                            det=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_sample_pdf_matches_reference_pytest_seam():
    """The reference's pytest=True seam replaces u with seeded numpy
    randoms (run_nerf_helpers.py:220-229); feed the identical u to ours."""
    import run_nerf_helpers as rh

    rng = np.random.RandomState(2)
    bins = np.sort(rng.uniform(2, 6, size=(16, 31)), axis=-1).astype(
        np.float32
    )
    weights = rng.uniform(0, 1, size=(16, 30)).astype(np.float32)
    n = 32
    ref = rh.sample_pdf(
        torch.tensor(bins), torch.tensor(weights), n, det=False, pytest=True
    ).numpy()
    np.random.seed(0)
    u = np.random.rand(16, n).astype(np.float64)
    got = np.asarray(
        sampling.sample_pdf(
            jnp.asarray(bins), jnp.asarray(weights), n,
            u=jnp.asarray(u, jnp.float32),
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_embedder_ordering_matches_reference():
    """posenc_nerf must reproduce the torch Embedder's feature ORDER
    (identity, then per-frequency sin/cos interleave) exactly —
    checkpoint import correctness depends on it."""
    import run_nerf_helpers as rh

    embed_fn, out_dim = rh.get_embedder(10)
    # Small coordinates: at 2^9 rad the fp32 trig of jax and torch differ
    # at the 1e-3 level, which would mask an ordering bug.
    x = 0.02 * np.random.RandomState(0).normal(size=(33, 3)).astype(
        np.float32
    )
    ref = embed_fn(torch.tensor(x)).numpy()
    got = np.asarray(encoding.posenc_nerf(jnp.asarray(x), 10))
    assert got.shape[-1] == out_dim
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_spherify_poses_matches_reference():
    import load_llff as ll

    rng = np.random.RandomState(4)
    # Cameras on a rough orbit looking inward.
    n = 12
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        pos = np.array([3 * np.cos(th), 3 * np.sin(th),
                        0.5 + 0.1 * rng.normal()])
        z = pos / np.linalg.norm(pos)  # looking away from origin (OpenGL -z)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        poses.append(np.stack([x, y, z, pos], 1))
    poses = np.stack(poses).astype(np.float32)
    bds = np.abs(rng.normal(size=(n, 2))).astype(np.float32) + 1.0

    ref_poses, ref_path, ref_bds = ll.spherify_poses(poses.copy(),
                                                     bds.copy())
    got_poses, got_path, got_bds = poses_lib.spherify_poses(poses.copy(),
                                                            bds.copy())
    np.testing.assert_allclose(got_poses, ref_poses[:, :3, :4], atol=1e-4)
    np.testing.assert_allclose(got_bds, ref_bds, atol=1e-5)
    np.testing.assert_allclose(got_path[..., :4], ref_path[:, :3, :4],
                               atol=1e-4)


def test_recenter_poses_matches_reference():
    import load_llff as ll

    rng = np.random.RandomState(9)
    poses = np.stack([
        np.concatenate([_rand_c2w(i), rng.normal(size=(3, 1)).astype(
            np.float32)], 1)
        for i in range(7)
    ])  # [N, 3, 5] (llff carries hwf in col 4)
    ref = ll.recenter_poses(poses.copy())
    got = poses_lib.recenter_poses(poses.copy())
    np.testing.assert_allclose(got[:, :3, :4], ref[:, :3, :4], atol=1e-5)


def test_reprojection_matches_reference_get_ref_rays():
    """Our world_to_ref_pixels projection (y/z flip, K-project, round,
    strict bounds) against mask_generator.get_ref_rays' actual outputs."""
    import importlib

    mg = importlib.import_module("internal.mask_utils.mask_generator")

    H, W = 20, 28
    K = np.array([[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :4] = _rand_c2w(7)
    c2w[:3, 3] *= 0.1  # keep points projecting near the image
    w2c = np.linalg.inv(c2w)

    rng = np.random.RandomState(1)
    # points in front of the reference camera: z in [-3.5, -0.5] cam frame
    pts_cam = np.stack(
        [rng.uniform(-0.6, 0.6, 300), rng.uniform(-0.4, 0.4, 300),
         -rng.uniform(0.5, 3.5, 300)], -1
    ).astype(np.float32)
    pts_w = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]

    img = torch.zeros((1, 3, H, W))
    out = mg.get_ref_rays(
        torch.tensor(w2c)[None],
        torch.tensor(c2w)[None],
        torch.tensor(K)[None],
        torch.tensor(pts_w)[None, :, None, :],
        img,
    )
    _, ref_pts_cam_flipped, _, _, ref_mask = out

    x, y, z, in_b = reproject.world_to_ref_pixels(
        jnp.asarray(pts_w), jnp.asarray(w2c), jnp.asarray(K), H, W
    )
    # Projected camera-frame point (after the reference's y/z flip).
    flip = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    expect_cam = ref_pts_cam_flipped[0].numpy()
    got_cam = (pts_w @ w2c[:3, :3].T + w2c[:3, 3]) @ flip
    np.testing.assert_allclose(got_cam, expect_cam, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(in_b),
                                  ref_mask[0].numpy().astype(bool))
    # And z agrees with the flipped camera-frame depth used for occlusion.
    np.testing.assert_allclose(np.asarray(z), expect_cam[:, 2], atol=1e-4)


def test_sorted_piecewise_constant_pdf_matches_reference():
    """JAX-vs-JAX golden: our RegNeRF-style sampler against the
    reference's internal/math.py implementation, deterministic path."""
    import importlib

    ref_math = importlib.import_module("internal.math")

    rng = np.random.RandomState(3)
    bins = np.sort(rng.uniform(0, 5, size=(10, 17)), -1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(10, 16)).astype(np.float32)
    ref = np.asarray(
        ref_math.sorted_piecewise_constant_pdf(
            None, jnp.asarray(bins), jnp.asarray(weights), 24
        )
    )
    got = np.asarray(
        sampling.sorted_piecewise_constant_pdf(
            None, jnp.asarray(bins), jnp.asarray(weights), 24
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)
