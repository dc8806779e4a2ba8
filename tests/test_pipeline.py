"""Tests for host-side batching and prefetch."""

import numpy as np
import pytest

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.data import synthetic
from consistentnerf_tpu.data.pipeline import (
    AllImagesBatcher,
    MipBatcher,
    Prefetcher,
    VanillaBatcher,
)


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(n_views=5, H=40, W=40).to_scene_data()


def test_vanilla_batcher_layout(scene):
    cfg = Config(N_rand=100, n_patches=2, patch_size=8)
    b = VanillaBatcher(scene, cfg)
    batch = b.next_batch()
    n = 2 * 64 + 100
    assert batch["rgb"].shape == (n, 3)
    assert batch["origins"].shape == (n, 3)
    assert batch["depth"].shape == (n,)
    assert batch["mask"].shape == (n,)
    np.testing.assert_allclose(
        np.linalg.norm(batch["viewdirs"], axis=-1), 1.0, atol=1e-5
    )
    # First patch is 64 contiguous pixels from an 8x8 block: all rays share
    # one origin (same camera).
    assert np.allclose(batch["origins"][0], batch["origins"][63])


def test_vanilla_batcher_no_patches(scene):
    """n_patches=0 (patch-term ablations) must batch plain rays, not crash
    (regression: queue F leg polf_3nopatch, RUNS_r4.md)."""
    cfg = Config(N_rand=64, n_patches=0)
    b = VanillaBatcher(scene, cfg)
    batch = b.next_batch()
    assert batch["rgb"].shape == (64, 3)
    assert batch["origins"].shape == (64, 3)


def test_vanilla_patch_white_rejection():
    """Patches in a mostly-empty (white) scene still resolve via retry cap."""
    scene = synthetic.make_scene(n_views=3, H=32, W=32).to_scene_data()
    # Make one image fully white: rejection must give up, not hang.
    scene.images[0][:] = 1.0
    cfg = Config(N_rand=16, n_patches=2, patch_size=8)
    b = VanillaBatcher(scene, cfg)
    for _ in range(3):
        batch = b.next_batch()
        assert batch["rgb"].shape[0] == 2 * 64 + 16


def test_all_images_batcher_epoch_reshuffle(scene):
    cfg = Config(N_rand=64, n_patches=0, patch_size=16, use_batching=True)
    b = AllImagesBatcher(scene, cfg)
    n_pool = b.n
    seen = 0
    while seen + 64 <= n_pool:
        b.next_batch()
        seen += 64
    batch = b.next_batch()  # wraps and reshuffles
    assert batch["rgb"].shape == (64, 3)


def test_mip_batcher_rays_struct(scene):
    cfg = Config(N_rand=128, backbone="mipnerf")
    b = MipBatcher(scene, cfg)
    batch = b.next_batch()
    n = 4 * 256 + 128
    assert batch["rays"].origins.shape == (n, 3)
    assert batch["rays"].radii.shape == (n, 1)
    assert batch["rays"].near.shape == (n, 1)
    assert batch["rgb"].shape == (n, 3)
    assert batch["dpts"].shape == (n,)
    assert float(batch["rays"].near[0, 0]) == scene.near


def test_mip_batcher_random_pose_rays(scene):
    cfg = Config(
        N_rand=64, backbone="mipnerf", load_random_rays=True,
        batch_size_random=128, random_patch_size=8,
    )
    b = MipBatcher(scene, cfg, random_poses=scene.poses[:3])
    batch = b.next_batch()
    assert batch["rays_random"].origins.shape == (128, 3)


def test_prefetcher_delivers_and_closes(scene):
    cfg = Config(N_rand=32, n_patches=1, patch_size=8)
    p = Prefetcher(VanillaBatcher(scene, cfg), depth=2)
    batches = [next(p) for _ in range(5)]
    assert all(b["rgb"].shape[0] == 64 + 32 for b in batches)
    p.close()


def test_pseudo_label_branch(scene):
    from consistentnerf_tpu.configs import Config as _C

    cfg = _C(N_rand=32, n_patches=1, patch_size=8,
             use_test_pseudo_label=True, seed=3)
    b = VanillaBatcher(scene, cfg)
    scales = set()
    for _ in range(60):
        batch = b.next_batch()
        scales.add(float(batch["loss_scale"]))
    # Both regular (1.0) and pseudo-label (0.1) batches occur.
    assert len(scales) == 2
    assert min(scales) == pytest.approx(0.1)
    assert max(scales) == pytest.approx(1.0)


def test_ndc_scene_rays_are_warped(scene):
    """For use_ndc scenes, training rays arrive NDC-warped (origins on the
    near plane, z=-1) while viewdirs stay in camera/world space."""
    import dataclasses

    ndc_scene = dataclasses.replace(scene)
    ndc_scene.use_ndc = True
    ndc_scene.near, ndc_scene.far = 0.0, 1.0
    cfg = Config(N_rand=64, n_patches=1, patch_size=8)
    b = VanillaBatcher(ndc_scene, cfg)
    batch = b.next_batch()
    np.testing.assert_allclose(batch["origins"][:, 2], -1.0, atol=1e-4)
    # viewdirs are unit-norm world-space directions (not NDC)
    np.testing.assert_allclose(
        np.linalg.norm(batch["viewdirs"], axis=-1), 1.0, atol=1e-5
    )
    assert not np.allclose(batch["directions"], batch["viewdirs"])


class _CountingBatcher:
    """Deterministic integer stream for prefetch-order tests."""

    def __init__(self, fail_at=None, stop_at=None):
        self.i = 0
        self.fail_at = fail_at
        self.stop_at = stop_at

    def __iter__(self):
        return self

    def __next__(self):
        if self.stop_at is not None and self.i >= self.stop_at:
            raise StopIteration
        if self.fail_at is not None and self.i >= self.fail_at:
            raise ValueError("poisoned batcher")
        v = self.i
        self.i += 1
        return v


def test_prefetcher_never_drops_batches():
    """A slow consumer must still see the exact batcher stream (the old
    implementation regenerated-and-dropped batches on queue.Full)."""
    import time

    p = Prefetcher(_CountingBatcher(), depth=1)
    time.sleep(0.1)  # let the producer hit queue.Full repeatedly
    got = []
    for _ in range(10):
        got.append(next(p))
        time.sleep(0.02)
    p.close()
    assert got == list(range(10)), got


def test_prefetcher_surfaces_batcher_exception():
    p = Prefetcher(_CountingBatcher(fail_at=2), depth=4)
    assert next(p) == 0
    assert next(p) == 1
    with pytest.raises(RuntimeError) as ei:
        next(p)
    assert isinstance(ei.value.__cause__, ValueError)
    p.close()


def test_prefetcher_propagates_stop_iteration():
    p = Prefetcher(_CountingBatcher(stop_at=3), depth=4)
    assert [next(p) for _ in range(3)] == [0, 1, 2]
    with pytest.raises(StopIteration):
        next(p)
    p.close()
