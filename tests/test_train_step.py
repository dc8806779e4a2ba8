"""Train-step tests: single step, 8-device sharding, e2e convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.data import synthetic
from consistentnerf_tpu.data.pipeline import MipBatcher, VanillaBatcher
from consistentnerf_tpu.models.factory import make_model
from consistentnerf_tpu.parallel import create_mesh, shard_batch
from consistentnerf_tpu.train import loop as loop_lib
from consistentnerf_tpu.train import step as step_lib


def tiny_vanilla_cfg(**kw):
    base = dict(
        backbone="vanilla",
        netdepth=2,
        netwidth=32,
        N_samples=16,
        N_importance=8,
        multires=4,
        multires_views=2,
        N_rand=192,
        n_patches=1,
        patch_size=8,
        white_bkgd=True,
        near=2.0,
        far=6.0,
        use_tensorboard=False,
        i_print=10,
        checkpoint_every=10_000,
        hardmask=True,
        with_depth_loss=True,
    )
    base.update(kw)
    return Config(**base)


def tiny_mip_cfg(**kw):
    base = dict(
        backbone="mipnerf",
        netdepth=2,
        netwidth=32,
        mip_num_samples=8,
        mip_num_levels=2,
        max_deg_point=4,
        disable_normals=True,
        N_rand=1024 - 4 * 256,  # single_image_patch layout: >= 4*16*16 total
        white_bkgd=True,
        near=2.0,
        far=6.0,
        use_tensorboard=False,
        compute_depth_metrics=True,
        compute_mono_depth_metrics=True,
        use_hardmask=True,
        dataset_type="blender",
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(n_views=6, H=48, W=48).to_scene_data()


def test_vanilla_single_step(scene):
    cfg = tiny_vanilla_cfg()
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    train_step = step_lib.build_train_step(model, cfg, donate=False)
    new_state, stats = train_step(state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(float(stats["psnr"]))
    # some params changed (temperature scalars have no grad; check kernels)
    k0 = np.asarray(state.params["params"]["fine"]["pts_0"]["kernel"])
    k1 = np.asarray(new_state.params["params"]["fine"]["pts_0"]["kernel"])
    assert not np.allclose(k0, k1)


def test_vanilla_coarse_init_equals_fine(scene):
    cfg = tiny_vanilla_cfg()
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    state = loop_lib.init_state(cfg, model, batcher.next_batch())
    p = state.params["params"]
    for k in p["coarse"]:
        if k.startswith("pts_"):
            np.testing.assert_array_equal(
                np.asarray(p["coarse"][k]["kernel"]),
                np.asarray(p["fine"][k]["kernel"]),
            )


def test_vanilla_step_sharded_over_mesh(scene):
    """Batch sharded over the 8-device CPU mesh, params replicated."""
    cfg = tiny_vanilla_cfg(N_rand=8 * 32 - 64)  # total 192, divisible by 8
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    assert batch["rgb"].shape[0] % 8 == 0
    mesh = create_mesh()
    sharded = shard_batch(batch, mesh)
    state = loop_lib.init_state(cfg, model, batch)
    train_step = step_lib.build_train_step(model, cfg, donate=False)
    new_state, stats = train_step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(stats["loss"]))
    # Output params are replicated across devices.
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)


def test_mip_single_step(scene):
    cfg = tiny_mip_cfg()
    model = make_model(cfg)
    batcher = MipBatcher(scene, cfg)
    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    train_step = step_lib.build_train_step(model, cfg, donate=False)
    new_state, stats = train_step(state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert np.isfinite(float(stats["loss"]))
    assert stats["losses"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(stats["depth_mses"])))


def test_mip_step_with_tvnorm_random_rays(scene):
    cfg = tiny_mip_cfg(
        depth_tvnorm_decay=True,
        depth_tvnorm_maxstep=512,
        depth_tvnorm_loss_mult_start=400.0,
        depth_tvnorm_loss_mult_end=0.1,
        depth_tvnorm_mask_weight=1.0,
        load_random_rays=True,
        batch_size_random=128,
        random_patch_size=8,
    )
    model = make_model(cfg)
    scene2 = scene
    random_poses = scene2.poses[:4]
    batcher = MipBatcher(scene2, cfg, random_poses=random_poses)
    batch = batcher.next_batch()
    assert "rays_random" in batch
    state = loop_lib.init_state(cfg, model, batch)
    train_step = step_lib.build_train_step(model, cfg, donate=False)
    _, stats = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(stats["patch_tv_losses"])))
    assert float(np.asarray(stats["patch_tv_losses"]).sum()) != 0.0


def test_vanilla_converges_on_synthetic(scene):
    """~150 steps of the tiny model on the sphere scene must lift PSNR."""
    cfg = tiny_vanilla_cfg(
        total_iters=150, lrate=5e-3, hardmask=False, with_depth_loss=False,
        N_importance=0, basedir="/tmp/cnerf_test_logs", expname="conv",
        use_tensorboard=False, checkpoint_every=100000,
    )
    import shutil

    shutil.rmtree("/tmp/cnerf_test_logs", ignore_errors=True)
    result = loop_lib.train(cfg, scene, num_steps=150, use_prefetch=False,
                            log_fn=lambda s: None)
    psnrs = [float(h["psnr"]) for h in result.stats_history]
    assert psnrs[-1] > psnrs[0] + 2.0, f"no convergence: {psnrs}"
    assert psnrs[-1] > 12.0, f"final psnr too low: {psnrs}"
    assert result.rays_per_sec > 0


def test_vanilla_ss_loss_step(scene):
    """Online-reprojection (ss_loss) variant: one step runs and is finite."""
    cfg = tiny_vanilla_cfg(ss_loss=True, with_depth_loss=True)
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    assert "ref_image" in batch and batch["ref_pose"].shape == (3, 4)
    state = loop_lib.init_state(cfg, model, batch)
    train_step = step_lib.build_train_step(model, cfg, donate=False)
    new_state, stats = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(float(stats["ss_loss"]))
    assert int(new_state.step) == 1


def test_vanilla_ss_loss_sharded(scene):
    """ss_loss batch (with replicated ref-view leaves) shards cleanly."""
    cfg = tiny_vanilla_cfg(ss_loss=True, N_rand=8 * 32 - 64)
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    mesh = create_mesh()
    sharded = shard_batch(batch, mesh)
    state = loop_lib.init_state(cfg, model, batch)
    train_step = step_lib.build_train_step(model, cfg, donate=False)
    _, stats = train_step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(stats["loss"]))


def test_vanilla_use_noise_step(scene):
    cfg = tiny_vanilla_cfg(use_noise=True)
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    train_step = step_lib.build_train_step(model, cfg, donate=False)
    _, stats = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(stats["loss"]))


def test_loop_periodic_test_render(scene):
    cfg = tiny_vanilla_cfg(
        total_iters=20, basedir="/tmp/cnerf_test_logs", expname="rnd",
        train_render_every=10, i_print=10, checkpoint_every=100000,
        render_chunk_size=512, eval_disable_lpips=True, N_importance=0,
    )
    import shutil

    shutil.rmtree("/tmp/cnerf_test_logs/rnd", ignore_errors=True)
    result = loop_lib.train(cfg, scene, num_steps=20, use_prefetch=False,
                            log_fn=lambda s: None)
    import os

    out = "/tmp/cnerf_test_logs/rnd/train_renders"
    assert os.path.isfile(os.path.join(out, "color_000.png"))


def test_sharded_render_matches_single_device(scene):
    """shard_map render over the 8-device mesh == plain model.apply."""
    from consistentnerf_tpu.parallel.distributed_render import (
        render_image_sharded,
    )
    from consistentnerf_tpu.train import evaluation

    cfg = tiny_vanilla_cfg(N_importance=0)
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    state = loop_lib.init_state(cfg, model, batcher.next_batch())
    mesh = create_mesh()
    rays = evaluation.camera_rays_for_view(scene, scene.poses[0])

    out_sharded = render_image_sharded(
        model, cfg, state.params, rays, mesh
    )
    flat = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x).reshape(-1, x.shape[-1]), rays
    )
    out_ref = model.apply(state.params, None, flat)
    np.testing.assert_allclose(
        out_sharded["rgb"].reshape(-1, 3), np.asarray(out_ref["rgb"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        out_sharded["depth"].reshape(-1), np.asarray(out_ref["depth"]),
        atol=1e-5,
    )


def test_mip_converges_on_synthetic(scene):
    """~150 steps of the tiny mip model must lift PSNR on the sphere."""
    cfg = tiny_mip_cfg(
        total_iters=150, lr_init=5e-3, lr_final=5e-4, lr_delay_steps=0,
        basedir="/tmp/cnerf_test_logs", expname="mipconv",
        checkpoint_every=100000, compute_depth_metrics=False,
        compute_mono_depth_metrics=False, N_rand=0, i_print=10,
    )
    import shutil

    shutil.rmtree("/tmp/cnerf_test_logs/mipconv", ignore_errors=True)
    result = loop_lib.train(cfg, scene, num_steps=150, use_prefetch=False,
                            log_fn=lambda s: None)
    psnrs = [float(h["psnr"]) for h in result.stats_history]
    assert psnrs[-1] > psnrs[0] + 2.0, f"no convergence: {psnrs}"


def test_mip_step_dtu_config_exercises_midas_loss(tmp_path):
    """A DTU-config step on a DTU-fixture scene with real MiDaS PFMs must
    produce a nonzero mono-depth loss (VERDICT r2 item 3: the term was
    silently inert on DTU when mono_disp was hard zeros)."""
    from consistentnerf_tpu.data.dtu import load_dtu
    from consistentnerf_tpu.data.pfm import write_pfm
    from tests.test_loaders import _write_dtu_fixture

    h, w = 48, 64
    scan_dir = _write_dtu_fixture(tmp_path, h=h, w=w)
    midas_dir = tmp_path / "midas_dtu_depth" / "output_dtu_scan114"
    midas_dir.mkdir(parents=True)
    rng = np.random.RandomState(3)
    for vid in range(49):
        write_pfm(
            str(midas_dir / f"rect_{vid + 1:03d}_3_r5000"
                "-dpt_beit_large_512.pfm"),
            np.abs(rng.randn(h, w)).astype(np.float32),
        )
    dtu_scene = load_dtu(str(scan_dir), train_view_num=3,
                         crop_images=False)
    assert float(np.abs(dtu_scene.mono_disp).max()) > 0

    cfg = tiny_mip_cfg(dataset_type="dtu", near=dtu_scene.near,
                       far=dtu_scene.far)
    model = make_model(cfg)
    batcher = MipBatcher(dtu_scene, cfg)
    batch = batcher.next_batch()
    assert float(np.abs(np.asarray(batch["mono_dpts"])).max()) > 0
    state = loop_lib.init_state(cfg, model, batch)
    train_step = step_lib.build_train_step(model, cfg, donate=False)
    _, stats = train_step(state, batch, jax.random.PRNGKey(0))
    mono = np.asarray(stats["mono_depth_mses"])
    assert np.all(np.isfinite(mono))
    assert float(np.abs(mono).sum()) > 0.0


def test_training_is_seed_deterministic(scene):
    """Same seed => bitwise-identical parameters after several steps."""
    cfg = tiny_vanilla_cfg(seed=11)
    model = make_model(cfg)

    def run():
        batcher = VanillaBatcher(scene, cfg, seed=11)
        batch = batcher.next_batch()
        state = loop_lib.init_state(cfg, model, batch)
        ts = step_lib.build_train_step(model, cfg, donate=False)
        key = jax.random.PRNGKey(cfg.seed)
        for _ in range(3):
            state, _ = ts(state, batcher.next_batch(), key)
        return np.asarray(state.params["params"]["fine"]["pts_0"]["kernel"])

    k1, k2 = run(), run()
    np.testing.assert_array_equal(k1, k2)


def test_patch_lpips_engages_with_params(scene):
    """With lpips_params passed, the +0.005 patch LPIPS term is nonzero
    (run_nerf_view.py:1726-1728); without, it reports zero."""
    from consistentnerf_tpu.train import lpips as lpips_mod

    # patch_size >= 16: the VGG trunk max-pools 2x four times.
    cfg = tiny_vanilla_cfg(patch_size=16)
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, model, batch)

    lp = lpips_mod.init_params(jax.random.PRNGKey(0))
    ts = step_lib.build_vanilla_train_step(
        model, cfg, lpips_params=lp, donate=False
    )
    _, stats = ts(state, batch, jax.random.PRNGKey(0))
    assert float(stats["patch_lpips"]) != 0.0
    assert np.isfinite(float(stats["loss"]))

    ts0 = step_lib.build_vanilla_train_step(model, cfg, donate=False)
    _, stats0 = ts0(state, batch, jax.random.PRNGKey(0))
    assert float(stats0["patch_lpips"]) == 0.0


def test_loop_wires_lpips_weights_path(scene, tmp_path):
    """cfg.lpips_weights_path engages the train-time LPIPS term when a
    calibrated weights file is present, and SKIPS it (with a warning)
    when the file is missing — a random-init perceptual loss measured
    -6 dB held-out PSNR on the flagship synthetic run."""
    from consistentnerf_tpu.train import lpips as lpips_mod

    # Export a weights file in the calibrated format (values random, but
    # presence-of-file is the contract).
    params = lpips_mod.init_params(jax.random.PRNGKey(0))
    arrays = {}
    for bi, block in enumerate(params["convs"]):
        for ci, conv in enumerate(block):
            arrays[f"conv{bi}_{ci}_w"] = np.asarray(conv["w"])
            arrays[f"conv{bi}_{ci}_b"] = np.asarray(conv["b"])
    for bi, lin in enumerate(params["lins"]):
        arrays[f"lin{bi}"] = np.asarray(lin)
    wpath = tmp_path / "lpips.npz"
    np.savez(wpath, **arrays)

    cfg = tiny_vanilla_cfg(
        total_iters=2, i_print=1, basedir=str(tmp_path), expname="lpipswire",
        lpips_weights_path=str(wpath),
        checkpoint_every=100000, N_samples=8, N_importance=0, N_rand=64,
        netwidth=16, patch_size=16,
    )
    result = loop_lib.train(cfg, scene, num_steps=2, use_prefetch=False,
                            log_fn=lambda s: None)
    assert float(result.stats_history[0]["patch_lpips"]) != 0.0

    warnings = []
    cfg2 = cfg.replace(
        expname="lpipsmissing",
        lpips_weights_path=str(tmp_path / "missing_lpips.npz"),
    )
    result2 = loop_lib.train(cfg2, scene, num_steps=2, use_prefetch=False,
                             log_fn=warnings.append)
    assert float(result2.stats_history[0].get("patch_lpips", 0.0)) == 0.0
    assert any("SKIPPING" in w for w in warnings)


def test_patch_terms_skipped_in_use_batching_mode(scene):
    """AllImagesBatcher rays are an incoherent shuffled pool; patch terms
    must not contribute there."""
    from consistentnerf_tpu.data.pipeline import AllImagesBatcher

    cfg = tiny_vanilla_cfg(use_batching=True, N_rand=128, n_patches=1,
                           patch_size=8)
    model = make_model(cfg)
    batcher = AllImagesBatcher(scene, cfg)
    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    ts = step_lib.build_train_step(model, cfg, donate=False)
    _, stats = ts(state, batch, jax.random.PRNGKey(0))
    assert "mono_depth_loss" not in stats
    assert "patch_ssim" not in stats
    assert np.isfinite(float(stats["loss"]))


def test_training_seed_deterministic_with_prefetch(scene, tmp_path):
    """Same seed => identical params with the threaded Prefetcher ON
    (requires the no-drop Prefetcher; the old one consumed batcher state)."""
    def run(tag):
        cfg = tiny_vanilla_cfg(
            seed=11, total_iters=6, i_print=100,
            basedir=str(tmp_path), expname=f"det_{tag}",
            checkpoint_every=100000, N_samples=8, N_importance=0,
            N_rand=64, netwidth=16,
        )
        result = loop_lib.train(cfg, scene, num_steps=6, use_prefetch=True,
                                log_fn=lambda s: None)
        return np.asarray(
            result.state.params["params"]["coarse"]["pts_0"]["kernel"]
        )

    np.testing.assert_array_equal(run("a"), run("b"))


def test_fused_mip_step_matches_xla_step(scene):
    """The fused mip train step (interpret-mode kernels on CPU) produces
    the same loss and near-identical updated params as the XLA step."""
    from consistentnerf_tpu.ops.fused_train import build_fused_mip_train_step

    cfg = tiny_mip_cfg(
        use_fused_train=True, fused_tile=64,
        depth_tvnorm_decay=True,
        depth_tvnorm_maxstep=512,
        depth_tvnorm_loss_mult_start=400.0,
        depth_tvnorm_loss_mult_end=0.1,
        depth_tvnorm_mask_weight=1.0,
        load_random_rays=True,
        batch_size_random=128,
        random_patch_size=8,
        randomized=False,
    )
    model = make_model(cfg)
    batcher = MipBatcher(scene, cfg, random_poses=scene.poses[:4])
    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, model, batch)

    xla_step = step_lib.build_train_step(model, cfg, donate=False)
    fused_step = build_fused_mip_train_step(cfg, donate=False, tile=64)

    key = jax.random.PRNGKey(0)
    s_x, st_x = xla_step(state, batch, key)
    s_f, st_f = fused_step(state, batch, key)
    np.testing.assert_allclose(
        float(st_f["loss"]), float(st_x["loss"]), rtol=2e-4, atol=2e-4
    )
    lx = jax.tree_util.tree_leaves(s_x.params)
    lf = jax.tree_util.tree_leaves(s_f.params)
    for a, b in zip(lf, lx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
        )


def test_fused_step_ss_loss_and_noise_match_xla(scene):
    """The fused step applies ss_loss and use_noise identically to the
    XLA step (same rng folds; perturb=0 so forward rngs don't differ)."""
    from consistentnerf_tpu.ops.fused_train import (
        build_fused_vanilla_train_step,
    )

    cfg = tiny_vanilla_cfg(ss_loss=True, use_noise=True, perturb=0.0,
                           N_rand=8 * 32 - 64, fused_tile=64)
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, model, batch)
    xla_step = step_lib.build_train_step(model, cfg, donate=False)
    fused_step = build_fused_vanilla_train_step(cfg, donate=False,
                                                tile=64)
    key = jax.random.PRNGKey(0)
    _, st_x = xla_step(state, batch, key)
    _, st_f = fused_step(state, batch, key)
    assert "ss_loss" in st_f
    np.testing.assert_allclose(
        float(st_f["ss_loss"]), float(st_x["ss_loss"]), rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        float(st_f["loss"]), float(st_x["loss"]), rtol=2e-4, atol=2e-4
    )


def test_fused_step_shard_map_matches_unsharded(scene):
    """With a mesh passed, the fused kernels run under shard_map
    (explicit data-axis partitioning); results match the
    auto-partitioned (mesh=None) fused step bit-for-bit in fp32."""
    from consistentnerf_tpu.ops.fused_train import (
        build_fused_vanilla_train_step,
    )

    cfg = tiny_vanilla_cfg(N_rand=8 * 32 - 64, fused_tile=64, perturb=0.0)
    model = make_model(cfg)
    batcher = VanillaBatcher(scene, cfg)
    batch = batcher.next_batch()
    mesh = create_mesh()
    assert mesh.size == 8
    state = loop_lib.init_state(cfg, model, batch)
    step_plain = build_fused_vanilla_train_step(cfg, donate=False,
                                                tile=64)
    step_sharded = build_fused_vanilla_train_step(cfg, donate=False,
                                                  tile=64, mesh=mesh)
    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)
    _, st_p = step_plain(state, batch, key)
    s_s, st_s = step_sharded(state, sharded, key)
    np.testing.assert_allclose(
        float(st_s["loss"]), float(st_p["loss"]), rtol=1e-5, atol=1e-5
    )
    _, st_p2 = step_plain(state, batch, key)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_s.params),
        jax.tree_util.tree_leaves(
            step_plain(state, batch, key)[0].params
        ),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_fused_mip_step_shard_map_matches_unsharded(scene):
    """Mip counterpart of the shard_map equality test."""
    from consistentnerf_tpu.ops.fused_train import build_fused_mip_train_step

    cfg = tiny_mip_cfg(
        use_fused_train=True, fused_tile=64, randomized=False,
        load_random_rays=True, batch_size_random=128, random_patch_size=4,
        depth_tvnorm_loss_mult=0.1, depth_tvnorm_mask_weight=1.0,
    )
    model = make_model(cfg)
    batcher = MipBatcher(scene, cfg, random_poses=scene.poses[:4])
    batch = batcher.next_batch()
    mesh = create_mesh()
    state = loop_lib.init_state(cfg, model, batch)
    step_plain = build_fused_mip_train_step(cfg, donate=False, tile=64)
    step_sharded = build_fused_mip_train_step(cfg, donate=False, tile=64,
                                              mesh=mesh)
    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)
    _, st_p = step_plain(state, batch, key)
    s_s, st_s = step_sharded(state, sharded, key)
    np.testing.assert_allclose(
        float(st_s["loss"]), float(st_p["loss"]), rtol=1e-5, atol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_s.params),
        jax.tree_util.tree_leaves(step_plain(state, batch, key)[0].params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
