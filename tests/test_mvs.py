"""Learned MVS depth-prior network (models/mvs.py, train/mvs.py).

The synthetic sphere scene is the oracle: exact depths + view-consistent
shading, so warp geometry, cost-volume behavior, and trained-prior
quality are all checkable against ground truth.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.data import synthetic
from consistentnerf_tpu.models import mvs as mvs_lib
from consistentnerf_tpu.train import mvs as mvs_train


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(n_views=6, H=48, W=48).to_scene_data()


def _tiny_cfg(**kw):
    base = dict(
        dataset_type="synthetic",
        mvs_num_depths=16,
        mvs_base_ch=4,
        mvs_n_src=2,
        mvs_lr=3e-3,
        use_tensorboard=False,
    )
    base.update(kw)
    return Config(**base)


def _view_triple(scene, ref):
    srcs = mvs_lib.select_source_views(
        scene.poses, scene.i_train, ref, 2
    )
    return srcs


def test_warp_src_to_ref_gt_depth_oracle(scene):
    """Warping a source image into the ref view through the EXACT GT
    depth must reproduce the ref image wherever the surface is mutually
    visible — the geometry (camera convention, y/z flip, bilinear
    sampling) is wrong otherwise."""
    ref = int(scene.i_train[0])
    src = int(_view_triple(scene, ref)[0])
    warped, valid = mvs_lib.warp_src_to_ref(
        jnp.asarray(scene.images[src]),
        jnp.asarray(scene.depths[ref]),
        jnp.asarray(scene.poses[ref][:3, :4]),
        jnp.asarray(scene.poses[src][:3, :4]),
        jnp.asarray(scene.K),
    )
    warped, valid = np.asarray(warped), np.asarray(valid)
    # Only pixels whose lifted point the SOURCE also sees (its own depth
    # agrees) are photometrically comparable — mutual-visibility test as
    # in the hard-mask generator.
    ref_d = scene.depths[ref]
    err = np.abs(warped - scene.images[ref]).mean(-1)
    sel = valid & (ref_d > 0)
    assert sel.sum() > 100
    # Median, not mean: sphere-limb pixels are visible in one view only.
    assert np.median(err[sel]) < 0.03


def test_plane_sweep_localizes_gt_depth(scene):
    """Across a sweep of depth planes, the photometrically-best plane for
    a surface pixel must sit near its GT depth — the cost volume carries
    the depth signal the 3D regularizer is meant to sharpen."""
    ref = int(scene.i_train[0])
    src = int(_view_triple(scene, ref)[0])
    H, W = scene.H, scene.W
    D = 24
    d_values = jnp.linspace(scene.near, scene.far, D)
    warped, valid = mvs_lib.plane_sweep_warp(
        jnp.asarray(scene.images[src]),
        jnp.asarray(scene.poses[ref][:3, :4]),
        jnp.asarray(scene.poses[src][:3, :4]),
        jnp.asarray(scene.K),
        d_values,
        H,
        W,
    )
    err = jnp.abs(
        warped - jnp.asarray(scene.images[ref])[None]
    ).mean(-1) + jnp.where(valid, 0.0, 1e3)
    best = np.asarray(d_values)[np.asarray(jnp.argmin(err, 0))]  # [H, W]
    gt = scene.depths[ref]
    sel = gt > 0
    frac_close = np.mean(
        np.abs(best[sel] - gt[sel]) < 2 * (scene.far - scene.near) / D
    )
    assert frac_close > 0.5, frac_close


def test_mvs_net_shapes_and_jit(scene):
    cfg = _tiny_cfg()
    net = mvs_lib.MVSDepthNet(num_depths=cfg.mvs_num_depths,
                              base_ch=cfg.mvs_base_ch)
    ref = int(scene.i_train[0])
    srcs = _view_triple(scene, ref)
    args = (
        jnp.asarray(scene.images[ref]),
        jnp.asarray(scene.images[srcs]),
        jnp.asarray(scene.poses[ref][:3, :4]),
        jnp.asarray(scene.poses[srcs][:3, :4]),
        jnp.asarray(scene.K),
        float(scene.near),
        float(scene.far),
    )
    params = net.init(jax.random.PRNGKey(0), *args)
    out = jax.jit(net.apply, static_argnums=(6, 7))(params, *args[:5],
                                                    scene.near, scene.far)
    H, W = scene.H, scene.W
    assert out["depth"].shape == (H, W)
    assert out["depth_lo"].shape == (H // 4, W // 4)
    assert out["conf"].shape == (H, W)
    assert out["prob"].shape == (cfg.mvs_num_depths, H // 4, W // 4)
    d = np.asarray(out["depth"])
    assert np.all(d >= scene.near) and np.all(d <= scene.far)
    c = np.asarray(out["conf"])
    assert np.all(c >= -1e-5) and np.all(c <= 1 + 1e-5)
    prob = np.asarray(out["prob"])
    np.testing.assert_allclose(prob.sum(0), 1.0, atol=1e-4)


def test_supervised_training_beats_baselines(scene):
    """~120 GT-supervised steps on the sphere: the trained prior's
    depth-MSE on valid pixels must clearly beat (a) the untrained net
    and (b) the best constant-depth baseline."""
    cfg = _tiny_cfg()
    step, params0, tx = mvs_train.build_mvs_train_step(
        cfg, scene, use_gt=True
    )
    priors0 = mvs_train.predict_depth_priors(
        cfg, scene, params0, conf_thresh=0.0
    )
    result = mvs_train.train_mvs_depth(
        cfg, scene, num_steps=120, log_fn=lambda s: None
    )
    priors = mvs_train.predict_depth_priors(
        cfg, scene, result.params, conf_thresh=0.0
    )

    i_train = np.asarray(scene.i_train)
    gt = scene.depths[i_train]
    valid = gt > 0

    def mse(pred):
        return float(np.mean((pred[i_train][valid] - gt[valid]) ** 2))

    trained = mse(priors)
    untrained = mse(priors0)
    const_best = min(
        float(np.mean((c - gt[valid]) ** 2))
        for c in np.linspace(scene.near, scene.far, 17)
    )
    assert trained < 0.5 * untrained, (trained, untrained)
    assert trained < 0.5 * const_best, (trained, const_best)


def test_self_supervised_training_reduces_loss(scene):
    """No GT: the photometric objective alone must optimize."""
    cfg = _tiny_cfg(mvs_supervise_gt=False)
    blind = dataclasses.replace(
        scene, depths=np.zeros_like(scene.depths)
    )
    step, params, tx = mvs_train.build_mvs_train_step(
        cfg, blind, use_gt=False
    )
    opt_state = tx.init(params)
    i_train = np.asarray(blind.i_train)
    srcs = {
        int(r): mvs_lib.select_source_views(
            blind.poses, i_train, int(r), cfg.mvs_n_src
        )
        for r in i_train
    }
    losses = []
    for it in range(60):
        ref = int(i_train[it % len(i_train)])
        params, opt_state, loss, _ = step(
            params, opt_state, jnp.int32(ref), jnp.asarray(srcs[ref])
        )
        losses.append(float(loss))
    first = np.mean(losses[: len(i_train)])
    last = np.mean(losses[-len(i_train):])
    assert last < 0.8 * first, (first, last)


def test_bootstrap_mvs_mode(scene):
    """cfg.bootstrap_mode='mvs' produces a scene with MVS priors and
    hard masks through the standard bootstrap path."""
    from consistentnerf_tpu.train.bootstrap import bootstrap_scene_priors

    cfg = _tiny_cfg(
        bootstrap_mode="mvs",
        hardmask=True,
        bootstrap_fuse_priors=True,
        # 40 steps is a plumbing run — the confidence gate would zero a
        # barely-trained net's priors (quality is test_supervised_*'s
        # job, with a full budget).
        mvs_conf_thresh=0.0,
    )
    boot, result = bootstrap_scene_priors(
        cfg, scene, warmup_steps=40, log_fn=lambda s: None,
    )
    i_train = np.asarray(scene.i_train)
    assert float(np.max(boot.depths[i_train])) > 0
    assert boot.masks.shape == scene.images.shape[:3]
    # Non-train views carry no prior.
    others = [v for v in range(scene.images.shape[0]) if v not in i_train]
    assert float(np.max(boot.depths[others])) == 0.0


def test_train_mvs_cli(tmp_path):
    """The CLI trains on the synthetic scene and writes reference-layout
    PFMs (+ masks)."""
    from consistentnerf_tpu.cli import train_mvs
    from consistentnerf_tpu.data.pfm import read_pfm

    out = tmp_path / "priors"
    train_mvs.main([
        "--set", "dataset_type=synthetic",
        "--set", "mvs_num_depths=8",
        "--set", "mvs_base_ch=4",
        "--set", f"basedir={tmp_path}",
        "--set", "expname=mvscli",
        "--steps", "8",
        "--out", str(out),
        "--with-masks",
    ])
    # load_scene's synthetic default is the interleaved test split.
    scene = synthetic.make_scene().to_scene_data(interleave_test=True)
    for vid in np.asarray(scene.i_train):
        depth, _ = read_pfm(str(out / f"depth_{vid:04d}.pfm"))
        assert depth.shape == (scene.H, scene.W)
        assert (out / f"{vid}_mask_mvs.jpg").exists()


def test_scale_k_pixel_center_exact_at_non_multiple_of_4():
    """scale_K must use the pixel-center convention (ADVICE r4): a point
    at full-res continuous pixel x lands at (x+0.5)*s-0.5 in the
    downsampled grid. Checked at a non-multiple-of-4 size where the
    raw cx*s convention is off by (1-s)/2 px."""
    H, W = 9, 10
    Hf, Wf = -(-H // 4), -(-W // 4)  # ceil-divided feature resolution
    sx, sy = Wf / W, Hf / H
    K = jnp.array([[12.0, 0, 0.5 * W], [0, 12.0, 0.5 * H], [0, 0, 1]])
    Kf = mvs_lib.scale_K(K, sx, sy)

    rng = np.random.RandomState(0)
    pts = rng.randn(64, 3).astype(np.float32) * 0.3 + np.array(
        [0, 0, -4.0], np.float32
    )
    c2w = jnp.eye(4)[:3, :4]
    x, y, z, _ = mvs_lib.project_to_pixels(jnp.asarray(pts), c2w, K, H, W)
    xf, yf, zf, _ = mvs_lib.project_to_pixels(
        jnp.asarray(pts), c2w, Kf, Hf, Wf
    )
    np.testing.assert_allclose(np.asarray(xf), (np.asarray(x) + 0.5) * sx - 0.5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(yf), (np.asarray(y) + 0.5) * sy - 0.5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(zf), np.asarray(z), atol=1e-6)


def test_project_to_pixels_matches_reproject_convention():
    """models/mvs.py::project_to_pixels is the continuous analog of
    consistency/reproject.py::world_to_ref_pixels; the two must agree on
    the camera convention (y/z flip) or MVS depths stop interoperating
    with the hard-mask subsystem. Binding equality test (ADVICE r4)."""
    from consistentnerf_tpu.consistency import reproject

    scene = synthetic.make_scene(n_views=3, H=16, W=16)
    c2w = jnp.asarray(scene.poses[1])
    c2w4 = jnp.eye(4).at[:3, :4].set(c2w)
    w2c = jnp.linalg.inv(c2w4)
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(128, 3).astype(np.float32) * 0.5)

    x_c, y_c, z_c, _ = mvs_lib.project_to_pixels(
        pts, c2w, jnp.asarray(scene.K), scene.H, scene.W
    )
    x_r, y_r, z_r, _ = reproject.world_to_ref_pixels(
        pts, w2c, jnp.asarray(scene.K), scene.H, scene.W
    )
    np.testing.assert_allclose(np.round(np.asarray(x_c)), np.asarray(x_r),
                               atol=1e-4)
    np.testing.assert_allclose(np.round(np.asarray(y_c)), np.asarray(y_r),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(z_c), np.asarray(z_r), rtol=1e-5)


def test_mvs_pixel_dirs_is_core_rays_pixel_dirs():
    """Drift guard: the module re-exports core/rays.py::pixel_dirs rather
    than maintaining a parallel copy (ADVICE r4)."""
    from consistentnerf_tpu.core import rays as rays_core

    assert mvs_lib.pixel_dirs is rays_core.pixel_dirs


def test_prior_depths_never_supervise_as_gt(scene):
    """Circularity guard (ADVICE r4): a scene whose depths are LOADED
    priors (depth_is_gt=False, e.g. external PFMs attached by the
    blender/LLFF loaders) must train the MVS net photometrically — never
    on the priors it is meant to replace. GT-flagged depths (synthetic,
    DTU scans) do use GT supervision."""
    cfg = _tiny_cfg()
    logs = []
    assert scene.depth_is_gt  # synthetic analytic depth IS ground truth
    mvs_train.train_mvs_depth(cfg, scene, num_steps=1, log_fn=logs.append)
    assert any("GT-supervised" in s for s in logs), logs

    prior_scene = dataclasses.replace(scene, depth_is_gt=False)
    logs = []
    mvs_train.train_mvs_depth(cfg, prior_scene, num_steps=1,
                              log_fn=logs.append)
    assert any("photometric self-supervised" in s for s in logs), logs
