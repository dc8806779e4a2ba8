"""Tests for the evaluation pipeline and visualization suite."""

import os

import jax
import numpy as np
import pytest

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.data import synthetic
from consistentnerf_tpu.data.pipeline import VanillaBatcher
from consistentnerf_tpu.models.factory import make_model
from consistentnerf_tpu.train import evaluation, loop as loop_lib, vis
from consistentnerf_tpu.train import render as render_lib


@pytest.fixture(scope="module")
def trained():
    scene = synthetic.make_scene(n_views=5, H=32, W=32).to_scene_data()
    cfg = Config(
        backbone="vanilla", netdepth=2, netwidth=32, N_samples=8,
        N_importance=4, multires=4, multires_views=2, N_rand=64,
        n_patches=1, patch_size=8, white_bkgd=True, use_tensorboard=False,
        render_chunk_size=256, eval_disable_lpips=True,
    )
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    state = loop_lib.init_state(cfg, model, batcher.next_batch())
    return scene, cfg, model, state


def test_render_image_shapes(trained):
    scene, cfg, model, state = trained
    rays = evaluation.camera_rays_for_view(scene, scene.poses[0])
    out = render_lib.render_image(model, cfg, state.params, rays)
    assert out["rgb"].shape == (32, 32, 3)
    assert out["depth"].shape == (32, 32)
    assert out["acc"].shape == (32, 32)
    assert np.all(np.isfinite(out["rgb"]))


def test_render_chunking_invariant(trained):
    """Output must not depend on the chunk size."""
    scene, cfg, model, state = trained
    rays = evaluation.camera_rays_for_view(scene, scene.poses[1])
    out1 = render_lib.render_image(model, cfg, state.params, rays)
    cfg2 = cfg.replace(render_chunk_size=128)
    out2 = render_lib.render_image(model, cfg2, state.params, rays)
    np.testing.assert_allclose(out1["rgb"], out2["rgb"], atol=1e-5)


def test_render_multiview_stack_matches_per_view(trained):
    """A [V, H, W] stacked dispatch (cli/render.py --views-per-call)
    must produce exactly the per-view renders."""
    scene, cfg, model, state = trained
    rays = [evaluation.camera_rays_for_view(scene, scene.poses[i])
            for i in range(3)]
    render = render_lib.build_render_fn(model, cfg, state.params)
    stacked = render(render_lib.stack_rays(rays))
    assert stacked["rgb"].shape == (3, 32, 32, 3)
    assert stacked["depth"].shape == (3, 32, 32)
    for i, r in enumerate(rays):
        single = render(r)
        for k in ("rgb", "depth", "acc"):
            np.testing.assert_allclose(
                np.asarray(stacked[k][i]), np.asarray(single[k]),
                atol=1e-5,
            )


def test_evaluate_writes_artifacts(tmp_path, trained):
    scene, cfg, model, state = trained
    metrics = evaluation.evaluate(
        model, cfg, state.params, scene, out_dir=str(tmp_path), step=7
    )
    assert "psnr" in metrics and "ssim" in metrics and "census_err" in metrics
    assert os.path.isfile(tmp_path / "metric_psnr_7.txt")
    assert os.path.isfile(tmp_path / "metrics.txt")
    assert os.path.isfile(tmp_path / "color_000.png")
    assert os.path.isfile(tmp_path / "depth_000.png")


def test_metrics_aggregator_roundtrip(tmp_path, trained):
    scene, cfg, model, state = trained
    d1 = tmp_path / "exp1" / "test_preds"
    d1.mkdir(parents=True)
    (d1 / "metrics.txt").write_text("psnr: 20.0\nssim: 0.5\n")
    d2 = tmp_path / "exp2" / "test_preds"
    d2.mkdir(parents=True)
    (d2 / "metrics.txt").write_text("psnr: 30.0\nssim: 0.7\n")
    from consistentnerf_tpu.cli.metrics import collect

    agg = collect([str(tmp_path / "exp1"), str(tmp_path / "exp2")])
    assert agg["psnr"] == pytest.approx(25.0)
    assert agg["ssim"] == pytest.approx(0.6)


def test_visualize_depth_and_suite():
    rng = np.random.RandomState(0)
    depth = rng.rand(16, 16).astype(np.float32) * 4 + 2
    acc = np.clip(rng.rand(16, 16), 0, 1).astype(np.float32)
    img = vis.visualize_depth(depth, acc)
    assert img.shape == (16, 16, 3)
    assert np.all(img >= 0) and np.all(img <= 1)

    suite = vis.visualize_suite(
        {"rgb": rng.rand(16, 16, 3), "depth": depth, "acc": acc,
         "disp": 1.0 / depth}
    )
    for k in ["color", "depth", "disp", "acc"]:
        assert suite[k].shape == (16, 16, 3), k


def test_save_img_u8(tmp_path):
    img = np.random.RandomState(1).rand(8, 8, 3)
    path = str(tmp_path / "x.png")
    vis.save_img_u8(img, path)
    import imageio.v2 as imageio

    back = imageio.imread(path)
    assert back.shape == (8, 8, 3)


def test_mip_render_image_extras():
    scene = synthetic.make_scene(n_views=3, H=24, W=24).to_scene_data()
    cfg = Config(
        backbone="mipnerf", netdepth=2, netwidth=16, mip_num_samples=4,
        max_deg_point=4, disable_normals=True, N_rand=32,
        white_bkgd=True, render_chunk_size=192, use_tensorboard=False,
    )
    from consistentnerf_tpu.models.factory import make_model as mk

    model = mk(cfg)
    from consistentnerf_tpu.data.pipeline import MipBatcher

    batcher = MipBatcher(scene, cfg)
    state = loop_lib.init_state(cfg, model, batcher.next_batch())
    rays = evaluation.camera_rays_for_view(scene, scene.poses[0])
    out = render_lib.render_image(model, cfg, state.params, rays)
    assert out["rgb"].shape == (24, 24, 3)
    assert out["acc"].shape == (24, 24)
    assert out["distance_median"].shape == (24, 24)
    assert np.all(np.isfinite(out["rgb"]))


def test_mip_batching_modes():
    from consistentnerf_tpu.data.pipeline import MipBatcher

    scene = synthetic.make_scene(n_views=4, H=24, W=24).to_scene_data()
    for mode, expect in [("single_image_patch", 4 * 256 + 32),
                         ("single_image", 4 * 256 + 32),
                         ("all_images", 4 * 256 + 32)]:
        cfg = Config(backbone="mipnerf", N_rand=32, batching=mode)
        b = MipBatcher(scene, cfg)
        batch = b.next_batch()
        assert batch["rgb"].shape == (expect, 3), mode
        assert batch["rays"].origins.shape == (expect, 3), mode


def test_visualize_rays():
    rng = np.random.RandomState(0)
    t_vals = np.sort(rng.rand(8, 17) * 4 + 2, -1)
    weights = rng.rand(8, 16)
    rgbs = rng.rand(8, 16, 3)
    img = vis.visualize_rays(t_vals, weights, rgbs)
    assert img.ndim == 3 and img.shape[-1] == 3
    assert img.min() >= 0 and img.max() <= 1


def test_compute_image_metrics_masked_and_lpips():
    from consistentnerf_tpu.train.evaluation import compute_image_metrics
    from consistentnerf_tpu.train.lpips import LPIPS

    rng = np.random.RandomState(7)
    gt = rng.rand(32, 32, 3).astype(np.float32)
    pred = np.clip(gt + 0.05 * rng.randn(32, 32, 3), 0, 1).astype(np.float32)
    mask = (rng.rand(32, 32) > 0.5).astype(np.float32)
    lp = LPIPS(weights_path=None)
    m = compute_image_metrics(pred, gt, lp, mask)
    for k in ["psnr", "ssim", "census_err", "lpips", "avg_err",
              "masked_psnr", "masked_ssim", "masked_lpips"]:
        assert k in m and np.isfinite(m[k]), k
    assert m["psnr"] > 20


def test_imported_torch_ckpt_renders():
    """Full circle: reference-format .tar -> import -> render an image."""
    import tempfile

    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_torch_ckpt_import import _make_reference_state_dict

    from consistentnerf_tpu.cli.import_torch_ckpt import import_checkpoint
    from consistentnerf_tpu.models.factory import make_model

    rng = np.random.RandomState(3)
    sd_c = _make_reference_state_dict(rng, width=32)
    sd_f = _make_reference_state_dict(rng, width=32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "050000.tar")
        torch.save(
            {"global_step": 50000, "network_fn_state_dict": sd_c,
             "network_fine_state_dict": sd_f},
            path,
        )
        params, step = import_checkpoint(path)

    import jax.numpy as jnp

    params = jax.tree_util.tree_map(jnp.asarray, params)
    scene = synthetic.make_scene(n_views=3, H=16, W=16).to_scene_data()
    cfg = Config(
        backbone="vanilla", netdepth=8, netwidth=32, N_samples=8,
        N_importance=4, render_chunk_size=128, use_tensorboard=False,
    )
    model = make_model(cfg)
    rays = evaluation.camera_rays_for_view(scene, scene.poses[0])
    out = render_lib.render_image(model, cfg, params, rays)
    assert out["rgb"].shape == (16, 16, 3)
    assert np.all(np.isfinite(out["rgb"]))


def test_evaluate_stacked_dispatch_matches_per_view(trained, tmp_path):
    """evaluate() routes through the stacked [V, H, W] render dispatch
    (eval_views_per_call > 1); metrics must be identical to the per-view
    path — including on a ragged last group (3 test views, group of 2)."""
    scene, cfg, model, state = trained
    views = np.array([0, 2, 4])
    per_view = evaluation.evaluate(
        model, cfg.replace(eval_views_per_call=1), state.params, scene,
        out_dir=str(tmp_path / "pv"), views=views,
    )
    stacked = evaluation.evaluate(
        model, cfg.replace(eval_views_per_call=2), state.params, scene,
        out_dir=str(tmp_path / "st"), views=views,
    )
    for k in per_view:
        if k == "eval_rays_per_sec":
            continue
        np.testing.assert_allclose(stacked[k], per_view[k], atol=1e-5,
                                   err_msg=k)
    # The stacked path still writes the per-view artifacts.
    assert os.path.isfile(str(tmp_path / "st" / "color_002.png"))


def test_evaluate_deferred_metrics_match_artifact_path(trained, tmp_path):
    """With no image artifacts requested, evaluate() runs the metric
    suite as jitted on-device graphs enqueued behind the renders with a
    single fetch (the eval-throughput fix, RUNS_r5.md §4); the metric
    values must match the blocking artifact path."""
    scene, cfg, model, state = trained
    views = np.array([0, 2, 4])
    blocking = evaluation.evaluate(
        model, cfg.replace(eval_views_per_call=2), state.params, scene,
        out_dir=str(tmp_path / "a"), views=views,
    )
    deferred = evaluation.evaluate(
        model, cfg.replace(eval_views_per_call=2), state.params, scene,
        out_dir=str(tmp_path / "b"), views=views, save_images=False,
    )
    for k in blocking:
        if k == "eval_rays_per_sec":
            continue
        np.testing.assert_allclose(deferred[k], blocking[k], atol=1e-5,
                                   err_msg=k)
    # The deferred run still writes the metric txt artifacts.
    assert os.path.isfile(str(tmp_path / "b" / "metrics.txt"))
    assert not os.path.isfile(str(tmp_path / "b" / "color_000.png"))


def test_evaluate_deferred_masked_fallback(trained, tmp_path):
    """Per-view eval masks (the DTU-masked suite) route the deferred
    path through per-view metric dispatches; masked metrics must match
    the blocking artifact path."""
    import dataclasses

    scene, cfg, model, state = trained
    masks = np.zeros(scene.images.shape[:3], np.float32)
    masks[:, 8:24, 8:24] = 1.0
    scene_m = dataclasses.replace(scene, masks=masks)
    cfg_m = cfg.replace(dataset_type="dtu", dtu_no_mask_eval=False,
                        eval_views_per_call=2)
    views = np.array([0, 2, 4])
    blocking = evaluation.evaluate(
        model, cfg_m, state.params, scene_m,
        out_dir=str(tmp_path / "a"), views=views,
    )
    deferred = evaluation.evaluate(
        model, cfg_m, state.params, scene_m,
        out_dir=None, views=views, save_images=False,
    )
    assert "masked_psnr" in deferred and "masked_ssim" in deferred
    for k in blocking:
        if k == "eval_rays_per_sec":
            continue
        np.testing.assert_allclose(deferred[k], blocking[k], atol=1e-5,
                                   err_msg=k)
