"""Tests for random pose generation and near/far annealing."""

import numpy as np
import pytest

from consistentnerf_tpu.data import random_poses as rp
from consistentnerf_tpu.data import synthetic


@pytest.fixture(scope="module")
def poses():
    return synthetic.make_scene(n_views=6, H=16, W=16).poses


def test_renderpath_poses_shape_and_orthonormal(poses):
    out = rp.generate_random_poses(poses, n_poses=10)
    assert out.shape == (10, 3, 4)
    for p in out:
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_linearcomb_includes_originals(poses):
    out = rp.generate_random_poses(poses, n_poses=10,
                                   pose_type="linearcomb")
    assert out.shape == (10, 3, 4)
    np.testing.assert_allclose(out[: poses.shape[0]], poses[:, :3, :4],
                               atol=1e-6)


def test_testposes_and_allposes(poses):
    t = rp.generate_random_poses(poses, pose_type="testposes",
                                 test_poses=poses[:2])
    assert t.shape == (2, 3, 4)
    a = rp.generate_random_poses(poses, pose_type="allposes")
    assert a.shape == (poses.shape[0], 3, 4)


def test_anneal_nearfar_schedule():
    # At step 0 with init_perc p: range shrunk toward the midpoint.
    near, far = rp.anneal_nearfar_values(0, 2.0, 6.0, n_steps=100,
                                         init_perc=0.5, mid_perc=0.5)
    assert near == pytest.approx(3.0)
    assert far == pytest.approx(5.0)
    # Fully annealed at/after n_steps.
    near, far = rp.anneal_nearfar_values(100, 2.0, 6.0, n_steps=100,
                                         init_perc=0.5)
    assert near == pytest.approx(2.0)
    assert far == pytest.approx(6.0)
    near2, far2 = rp.anneal_nearfar_values(500, 2.0, 6.0, n_steps=100,
                                           init_perc=0.5)
    assert (near2, far2) == (near, far)


def test_mip_batcher_applies_annealing():
    from consistentnerf_tpu.configs import Config
    from consistentnerf_tpu.data.pipeline import MipBatcher

    scene = synthetic.make_scene(n_views=4, H=32, W=32).to_scene_data()
    cfg = Config(
        backbone="mipnerf", N_rand=16, anneal_nearfar=True,
        anneal_nearfar_steps=10, anneal_nearfar_perc=0.5,
        anneal_mid_perc=0.5,
    )
    b = MipBatcher(scene, cfg)
    first = b.next_batch()
    n0 = float(first["rays"].near[0, 0])
    for _ in range(20):
        last = b.next_batch()
    n_final = float(last["rays"].near[0, 0])
    mid = scene.near + 0.5 * (scene.far - scene.near)
    assert n0 == pytest.approx(mid + 0.5 * (scene.near - mid))
    assert n_final == pytest.approx(scene.near)
