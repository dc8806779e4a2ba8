"""Tests for the reprojection hard-mask subsystem and consistency losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.consistency import masks, monodepth, reproject
from consistentnerf_tpu.core import rays as rays_core
from consistentnerf_tpu.data import synthetic


def test_effective_threshold_golden():
    f = reproject._effective_threshold
    # min_diff below tau0 -> tau0 itself
    assert float(f(jnp.array(0.05), 0.1)) == pytest.approx(0.1)
    # exactly tau0 -> needs one doubling (strict <)
    assert float(f(jnp.array(0.1), 0.1)) == pytest.approx(0.2)
    # 0.2 with tau0=0.1 -> 0.4 (0.2 < 0.2 fails, 0.2 < 0.4 passes)
    assert float(f(jnp.array(0.2), 0.1)) == pytest.approx(0.4)
    assert float(f(jnp.array(0.35), 0.1)) == pytest.approx(0.4)
    assert float(f(jnp.array(1e5), 0.1)) > 1e5


def test_self_projection_identity():
    """Projecting a view's own lifted points into itself matches exactly."""
    scene = synthetic.make_scene(n_views=4, H=32, W=32)
    i = 0
    pose = scene.poses[i]
    o, d = rays_core.get_rays(scene.H, scene.W, scene.K, pose)
    depth = scene.depths[i]
    pts = (
        np.asarray(o).reshape(-1, 3)
        + depth.reshape(-1, 1) * np.asarray(d).reshape(-1, 3)
    )
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :4] = pose
    w2c = np.linalg.inv(c2w)

    fg = scene.masks[i].reshape(-1)
    x, y, z_ref, in_bounds = reproject.world_to_ref_pixels(
        jnp.asarray(pts), jnp.asarray(w2c), jnp.asarray(scene.K),
        scene.H, scene.W,
    )
    x, y, z_ref = np.asarray(x), np.asarray(y), np.asarray(z_ref)
    ii, jj = np.meshgrid(np.arange(scene.W), np.arange(scene.H),
                         indexing="xy")
    # Foreground pixels away from the border project back to themselves.
    interior = fg & (np.asarray(in_bounds))
    np.testing.assert_array_equal(x[interior], ii.reshape(-1)[interior])
    np.testing.assert_array_equal(y[interior], jj.reshape(-1)[interior])
    # Depth in the ref frame equals the lift depth (z-flip makes it +).
    np.testing.assert_allclose(z_ref[interior],
                               depth.reshape(-1)[interior], atol=1e-3)


def test_hard_masks_on_synthetic_scene():
    """With exact multi-view-consistent depth, foreground is mostly masked
    and the target view's mask is nonzero only for train views."""
    scene = synthetic.make_scene(n_views=8, H=48, W=48)
    i_train = np.array([0, 1, 2])  # adjacent views, 45 deg apart
    hard = reproject.compute_hard_masks(
        scene.poses, scene.depths, scene.K, i_train, scene.H, scene.W,
        occlusion_threshold=0.1,
    )
    assert hard.shape == scene.depths.shape
    # Non-train views have empty masks.
    for i in [3, 5, 7]:
        assert hard[i].sum() == 0
    # Train views: most foreground is cross-view consistent at 45 deg.
    for i in i_train:
        fg = scene.masks[i]
        frac = hard[i][fg].mean()
        assert frac > 0.5, f"view {i}: only {frac:.2f} of fg consistent"


def test_hard_masks_background_depth_zero():
    """Background pixels (depth 0) lift to the camera origin; they should
    rarely pass the strict-depth occlusion test against real geometry."""
    scene = synthetic.make_scene(n_views=6, H=48, W=48)
    i_train = np.array([0, 2, 4])
    hard = reproject.compute_hard_masks(
        scene.poses, scene.depths, scene.K, i_train, scene.H, scene.W
    )
    for i in i_train:
        bg = ~scene.masks[i]
        assert hard[i][bg].mean() < 0.55


def test_masked_mse_equivalence():
    rng = np.random.RandomState(0)
    pred = jnp.array(rng.rand(32, 3), jnp.float32)
    tgt = jnp.array(rng.rand(32, 3), jnp.float32)
    m = jnp.array(rng.rand(32) > 0.5, jnp.float32)
    got = float(masks.masked_mse(pred, tgt, m))
    sel = np.asarray(m) > 0
    expected = float(np.mean((np.asarray(pred)[sel] - np.asarray(tgt)[sel]) ** 2))
    assert got == pytest.approx(expected, rel=1e-5)


def test_masked_mse_empty_mask_is_zero():
    pred = jnp.ones((8, 3))
    tgt = jnp.zeros((8, 3))
    assert float(masks.masked_mse(pred, tgt, jnp.zeros(8))) == 0.0


def test_hardmask_rgb_loss_all_masked_drops_out_term():
    rng = np.random.RandomState(1)
    pred = jnp.array(rng.rand(16, 3), jnp.float32)
    tgt = jnp.array(rng.rand(16, 3), jnp.float32)
    full = jnp.ones(16)
    got = float(masks.hardmask_rgb_loss(pred, tgt, full, 0.2))
    assert got == pytest.approx(float(jnp.mean((pred - tgt) ** 2)), rel=1e-5)


def test_softmask_losses_reduce_to_sensible_values():
    rng = np.random.RandomState(2)
    x = jnp.array(rng.rand(64, 3), jnp.float32)
    y = x  # identical -> zero loss
    assert float(masks.img2mse_softmask(x, y, 1.0)) == pytest.approx(0.0)
    assert float(masks.img2mse_softLpmask(x, y, 2.0)) == pytest.approx(0.0)


def test_temp_schedule_linear():
    assert float(masks.temp_schedule(0, 100, 1.0, 0.1)) == pytest.approx(1.0)
    assert float(masks.temp_schedule(100, 100, 1.0, 0.1)) == pytest.approx(0.1)
    assert float(masks.temp_schedule(200, 100, 1.0, 0.1)) == pytest.approx(0.1)


def test_midas_patch_loss_shift_scale_invariance():
    """The loss is invariant to affine transforms of the prediction."""
    rng = np.random.RandomState(3)
    depth = 2.0 + rng.rand(4 * 256).astype(np.float32)
    disp_prior = (1.0 / depth).astype(np.float32)
    base = float(monodepth.midas_patch_loss(jnp.array(depth),
                                            jnp.array(disp_prior)))
    # Scaling depth scales disparity; min-max norm removes it.
    scaled = float(
        monodepth.midas_patch_loss(jnp.array(depth * 3.0),
                                   jnp.array(disp_prior))
    )
    assert scaled == pytest.approx(base, abs=1e-5)
    # Loss of a perfectly consistent prediction is ~0.
    assert base < 1e-10


def test_midas_patch_loss_penalizes_inconsistency():
    rng = np.random.RandomState(4)
    depth = 2.0 + rng.rand(4 * 256).astype(np.float32)
    disp_prior = (1.0 / depth).astype(np.float32)
    wrong = rng.permutation(depth)
    bad = float(monodepth.midas_patch_loss(jnp.array(wrong),
                                           jnp.array(disp_prior)))
    assert bad > 1e-3


def test_edge_masks_shapes():
    scene = synthetic.make_scene(n_views=3, H=32, W=32)
    canny = masks.canny_masks(scene.images, [0, 1])
    sobel = masks.sobel_masks(scene.images, [0, 1])
    assert canny.shape == (3, 32, 32)
    assert sobel.shape == (3, 32, 32)
    assert canny[2].sum() == 0  # non-train view empty
    assert canny[0].sum() > 0  # sphere edge detected
    assert sobel[0].sum() > 0


def test_ref_rays_pass_through_gathered_pixels():
    """build_ref_rays directions must match get_rays at the projected pixel
    (the reference's get_ref_rays is y-mirrored/backwards; ours is not --
    see consistency/online.py)."""
    from consistentnerf_tpu.consistency import online

    scn = synthetic.make_scene(n_views=4, H=32, W=32).to_scene_data()
    tgt, ref = 0, 1
    K = jnp.asarray(scn.K, jnp.float32)
    ro, rd = rays_core.get_rays(scn.H, scn.W, K, scn.poses[tgt][:3, :4])
    pts_w = (
        jnp.asarray(ro).reshape(-1, 3)
        + jnp.asarray(scn.depths[tgt]).reshape(-1, 1)
        * jnp.asarray(rd).reshape(-1, 3)
    )
    out = online.build_ref_rays(
        pts_w,
        jnp.asarray(scn.poses[ref][:3, :4]),
        jnp.asarray(scn.images[ref]),
        jnp.asarray(scn.depths[ref]),
        K,
    )
    # Recompute the projected integer pixel of every point.
    c2w = jnp.eye(4).at[:3, :4].set(scn.poses[ref][:3, :4])
    x, y, _, in_b = reproject.world_to_ref_pixels(
        pts_w, jnp.linalg.inv(c2w), K, scn.H, scn.W
    )
    xi = np.clip(np.asarray(x), 0, scn.W - 1).astype(int)
    yi = np.clip(np.asarray(y), 0, scn.H - 1).astype(int)
    ref_o, ref_d = rays_core.get_rays(scn.H, scn.W, K,
                                      scn.poses[ref][:3, :4])
    expect_d = np.asarray(ref_d)[yi, xi]
    sel = np.asarray(in_b)
    assert sel.sum() > 50
    np.testing.assert_allclose(
        np.asarray(out["directions"])[sel], expect_d[sel], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["origins"])[sel],
        np.asarray(ref_o)[yi, xi][sel],
        atol=1e-5,
    )
    # And the gathered rgb target is the ref image at that pixel.
    np.testing.assert_allclose(
        np.asarray(out["rgb_target"])[sel],
        np.asarray(scn.images[ref])[yi, xi][sel],
        atol=1e-6,
    )
