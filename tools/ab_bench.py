"""Hardware A/B harness for the train-step and render fast paths.

Runs on the attached TPU, ONE process at a time (the axon relay wedges on
concurrent claims). Per-claim perf varies up to ~4-7x, so comparisons are
only meaningful WITHIN one invocation; each variant reports best-of-N
trials of an evolving-state loop with a float(loss) hard sync.

Usage:
    python tools/ab_bench.py [variant ...]
variants: xla fused_fp32 fused_bf16 fused_bf16_t512 render_xla
          render_fused render_fused_bf16 (default: all train variants)
"""

from __future__ import annotations

import json
import os
import sys
import time

# Runnable as `python tools/ab_bench.py` without an installed package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def setup_jax():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def flagship_cfg(**kw):
    from consistentnerf_tpu.configs import Config

    base = dict(
        backbone="vanilla",
        N_samples=64,
        N_importance=128,
        N_rand=4096,
        n_patches=4,
        patch_size=16,
        hardmask=True,
        with_depth_loss=True,
        white_bkgd=True,
        use_tensorboard=False,
        compute_dtype="bfloat16",
    )
    base.update(kw)
    return Config(**base)


def build_variant(name, scene, batch):
    import jax

    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import step as step_lib

    if name == "xla":
        cfg = flagship_cfg()
    elif name == "xla_coarse":
        # no fine level: isolates sample_pdf + the 2x-points fine MLP
        cfg = flagship_cfg(N_importance=0)
    elif name == "xla_noloss":
        # rgb-MSE only: isolates the consistency/patch loss terms
        cfg = flagship_cfg(hardmask=False, with_depth_loss=False,
                           n_patches=0)
    elif name == "v2_noloss":
        cfg = flagship_cfg(hardmask=False, with_depth_loss=False,
                           n_patches=0, use_fused_train=True,
                           fused_tile=1024, fused_kernel="v2")
    elif name == "xla_s192":
        # single level, same total point count as the flagship (983k):
        # isolates point-count scaling from the hierarchical machinery
        cfg = flagship_cfg(N_samples=192, N_importance=0)
    elif name == "v2_s192":
        cfg = flagship_cfg(N_samples=192, N_importance=0,
                           use_fused_train=True, fused_tile=1024,
                           fused_kernel="v2")
    elif name == "xla_remat":
        cfg = flagship_cfg(remat_mlp=True)
    elif name == "fused_fp32":
        cfg = flagship_cfg(use_fused_train=True, compute_dtype="float32",
                           fused_tile=256)
    elif name == "fused_bf16":
        cfg = flagship_cfg(use_fused_train=True, fused_tile=256,
                           fused_kernel="v1")
    elif name == "fused_bf16_t512":
        cfg = flagship_cfg(use_fused_train=True, fused_tile=512,
                           fused_kernel="v1")
    elif name == "fused_bf16_t1024":
        cfg = flagship_cfg(use_fused_train=True, fused_tile=1024,
                           fused_kernel="v1")
    elif name.startswith("v2_big"):
        # Large-batch scaling probe: 4x the flagship ray count.
        cfg = flagship_cfg(N_rand=16384, use_fused_train=True,
                           fused_tile=1024, fused_kernel="v2")
    elif name.startswith("v2_bf16_t"):
        # v2_bf16_t<bwd_tile>[_f<fwd_tile>][_s<fwd_streams>]
        spec = name[len("v2_bf16_t"):]
        streams = 1
        if "_s" in spec:
            spec, s_str = spec.split("_s")
            streams = int(s_str)
        parts = spec.split("_f")
        cfg = flagship_cfg(use_fused_train=True, fused_tile=int(parts[0]),
                           fused_kernel="v2",
                           fused_fwd_tile=int(parts[1]) if len(parts) > 1
                           else 0,
                           fused_fwd_streams=streams)
    elif name.startswith("onepass_"):
        # onepass_[big_]t<tile>[_fp32][_nopdfk][_noise][_ssloss]:
        # single-pass megakernel step; `big` = 16384-ray batch scaling
        # probe; `nopdfk` = XLA sample_pdf+sort instead of the fused
        # pdf+merge kernel; `noise`/`ssloss` = the use_noise /
        # online-reprojection trainer rows (each changes the kernel's
        # coefficient rows — measured and loss-guarded separately).
        spec = name[len("onepass_"):]
        big = spec.startswith("big_")
        if big:
            spec = spec[len("big_"):]
        assert spec.startswith("t"), name
        spec = spec[1:]
        kw = dict(N_rand=16384) if big else {}
        if "_nopdfk" in spec:  # position-independent suffix
            spec = spec.replace("_nopdfk", "")
            kw["use_pdf_kernel"] = False
        if "_noise" in spec:
            spec = spec.replace("_noise", "")
            kw["use_noise"] = True
        if "_ssloss" in spec:
            spec = spec.replace("_ssloss", "")
            kw["ss_loss"] = True
        cd = "float32" if spec.endswith("_fp32") else "bfloat16"
        tile = int(spec.split("_")[0])
        cfg = flagship_cfg(use_fused_train=True, use_onepass_train=True,
                           fused_tile=tile, compute_dtype=cd, **kw)
    elif name.startswith("softlp_"):
        # softlp_xla | softlp_fused_t<tile>: the softLpmask ablation
        # family (prediction-dependent global denominators) cannot run
        # one-pass (ops/fused_onepass.py::onepass_supported); these
        # measure its production fallback (two-call fused) cost.
        kw = dict(hardmask=False, softLpmask=True)
        if name == "softlp_xla":
            cfg = flagship_cfg(**kw)
        else:
            cfg = flagship_cfg(use_fused_train=True,
                               fused_tile=int(name.split("_t")[-1]),
                               fused_kernel="v2", **kw)
    elif name == "hybrid_bf16_t512":
        cfg = flagship_cfg(use_fused_train=True, fused_tile=512,
                           fused_kernel="hybrid")
    elif name.startswith("v2h_bf16"):
        cfg = flagship_cfg(use_fused_train=True,
                           fused_tile=int(name.split("_t")[-1]),
                           fused_kernel="v2h")
    else:
        raise ValueError(name)

    from consistentnerf_tpu.data.pipeline import VanillaBatcher

    expected = cfg.N_rand + cfg.n_patches * cfg.patch_size**2
    if batch["rgb"].shape[0] != expected:
        batch = VanillaBatcher(scene, cfg).next_batch()
    model = make_model(cfg)
    state = loop_lib.init_state(cfg, model, batch)
    if cfg.use_fused_train and cfg.use_onepass_train:
        from consistentnerf_tpu.ops import fused_onepass

        ts = fused_onepass.build_onepass_vanilla_train_step(cfg,
                                                            donate=False)
    elif cfg.use_fused_train:
        from consistentnerf_tpu.ops.fused_train import (
            build_fused_vanilla_train_step,
        )

        ts = build_fused_vanilla_train_step(cfg, donate=False)
    else:
        ts = step_lib.build_train_step(model, cfg, donate=False)
    return cfg, model, state, ts, batch


def check_step_loss(cfg, model, state, batch):
    """|loss(one-pass step) - loss(XLA step)| from identical params/batch,
    both deterministic (perturb=0) — the hardware-truth guard for steps
    whose gradients never go through jax.grad (the megakernel)."""
    import jax

    from consistentnerf_tpu.ops import fused_onepass
    from consistentnerf_tpu.train import step as step_lib

    det = cfg.replace(perturb=0.0)
    key = jax.random.PRNGKey(7)
    op_step = fused_onepass.build_onepass_vanilla_train_step(det,
                                                            donate=False)
    xla = step_lib.build_train_step(model, det, donate=False)
    _, st_v = op_step(state, batch, key)
    _, st_x = xla(state, batch, key)
    return abs(float(st_v["loss"]) - float(st_x["loss"]))


def check_step_loss_mip(cfg, model, state, batch):
    """Mip mirror of check_step_loss (deterministic = randomized off)."""
    import jax

    from consistentnerf_tpu.ops import fused_onepass
    from consistentnerf_tpu.train import step as step_lib

    det = cfg.replace(randomized=False)
    key = jax.random.PRNGKey(7)
    op_step = fused_onepass.build_onepass_mip_train_step(det, donate=False)
    xla = step_lib.build_train_step(model, det, donate=False)
    _, st_v = op_step(state, batch, key)
    _, st_x = xla(state, batch, key)
    return abs(float(st_v["loss"]) - float(st_x["loss"]))


def run_trajectory_check(names, n_steps=40):
    """Hardware-backward truth test: train the kernel step and the XLA
    step for `n_steps` DETERMINISTIC steps from identical init/batch/key
    and report the loss-trajectory gap + final param divergence.

    Per-step loss equality at one state (check_step_loss) cannot catch a
    miscompiled custom-VJP backward — the loss is computed by the
    forward. Trajectories can: wrong gradients bend the optimization
    path within a few steps. Names: traj_onepass, traj_fused,
    traj_mip_onepass.
    """
    import jax
    import numpy as np

    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import MipBatcher, VanillaBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import step as step_lib

    results = {}
    for name in names:
        t0 = time.time()
        mip = name.startswith("traj_mip")
        if mip:
            cfg_k = mip_cfg(use_fused_train=True, use_onepass_train=True,
                            fused_tile=1024, randomized=False)
            cfg_x = mip_cfg(randomized=False)
        else:
            kind = name.split("_", 1)[1]  # onepass | fused
            cfg_k = flagship_cfg(
                use_fused_train=True,
                use_onepass_train=(kind == "onepass"),
                fused_tile=1024,
                perturb=0.0,
            )
            cfg_x = flagship_cfg(perturb=0.0)
        scene = synthetic.make_scene(n_views=6, H=128, W=128
                                     ).to_scene_data()
        batcher = (MipBatcher if mip else VanillaBatcher)(scene, cfg_k)
        batch = batcher.next_batch()
        model = make_model(cfg_x)
        state0 = loop_lib.init_state(cfg_x, model, batch)

        def build(cfg):
            if cfg.use_onepass_train:
                from consistentnerf_tpu.ops import fused_onepass

                b = (fused_onepass.build_onepass_mip_train_step if mip
                     else fused_onepass.build_onepass_vanilla_train_step)
                return b(cfg, donate=False)
            if cfg.use_fused_train:
                from consistentnerf_tpu.ops.fused_train import (
                    build_fused_vanilla_train_step,
                )

                return build_fused_vanilla_train_step(cfg, donate=False)
            return step_lib.build_train_step(model, cfg, donate=False)

        key = jax.random.PRNGKey(7)

        def run(ts):
            st, losses = state0, []
            for _ in range(n_steps):
                st, stats = ts(st, batch, key)
                losses.append(float(stats["loss"]))  # hard sync per step
            return st, losses

        st_k, loss_k = run(build(cfg_k))
        st_x, loss_x = run(build(cfg_x))
        gaps = [abs(a - b) for a, b in zip(loss_k, loss_x)]
        leaves_k = jax.tree_util.tree_leaves(st_k.params)
        leaves_x = jax.tree_util.tree_leaves(st_x.params)
        pdiff = max(
            float(np.max(np.abs(np.asarray(a, np.float32)
                                - np.asarray(b, np.float32))))
            for a, b in zip(leaves_k, leaves_x)
        )
        results[name] = dict(
            loss_gap_step0=round(gaps[0], 6),
            loss_gap_mid=round(gaps[n_steps // 2], 6),
            loss_gap_final=round(gaps[-1], 6),
            final_loss_kernel=round(loss_k[-1], 5),
            final_loss_xla=round(loss_x[-1], 5),
            param_maxdiff=round(pdiff, 6),
            total_wall_s=round(time.time() - t0, 1),
        )
        print(name, json.dumps(results[name]), flush=True)
    return results


def check_forward(name, cfg, model, state, batch):
    """Max |rgb err| of this variant's COARSE forward vs the XLA forward.

    Detects the Mosaic bf16 miscompile class (err ~1.0 on HW while
    interpret mode is fine). Only the coarse level is compared: the fine
    level resamples z from the coarse weights, and on a random-init model
    tiny bf16 accumulation-order differences move the resampled bin
    choices, so fine-level pointwise diffs are large without any bug."""
    import numpy as np

    from consistentnerf_tpu.train import step as step_lib

    rays = step_lib.rays_from_batch(batch, cfg.near, cfg.far)
    out_ref = model.apply(state.params, None, rays)
    if cfg.use_fused_train:
        from consistentnerf_tpu.ops.fused_train import fused_vanilla_forward

        out = fused_vanilla_forward(state.params, None, rays, cfg,
                                    tile=cfg.fused_tile)
    else:
        out = out_ref
    k_rgb = "rgb0" if "rgb0" in out else "rgb"
    k_d = "depth0" if "depth0" in out else "depth"
    err = float(np.abs(np.asarray(out[k_rgb])
                       - np.asarray(out_ref[k_rgb])).max())
    derr = float(np.abs(np.asarray(out[k_d])
                        - np.asarray(out_ref[k_d])).max())
    return err, derr


def time_variant(name, state, ts, batch, n_steps=20, trials=3):
    import jax

    key = jax.random.PRNGKey(0)
    state, stats = ts(state, batch, key)  # compile
    float(stats["loss"])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, stats = ts(state, batch, key)
        loss = float(stats["loss"])
        dt = time.perf_counter() - t0
        best = min(best, dt / n_steps)
    return best, loss, state


def run_train_variants(names):
    import jax

    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import VanillaBatcher

    cfg0 = flagship_cfg()
    scene = synthetic.make_scene(n_views=6, H=128, W=128).to_scene_data()
    batch = VanillaBatcher(scene, cfg0).next_batch()
    n_rays = batch["rgb"].shape[0]

    results = {}
    for name in names:
        t_start = time.time()
        cfg, model, state, ts, vbatch = build_variant(name, scene, batch)
        print(f"{name}: built (+{time.time() - t_start:.0f}s), "
              "checking forward...", flush=True)
        err, derr = check_forward(name, cfg, model, state, vbatch)
        print(f"{name}: forward checked (+{time.time() - t_start:.0f}s), "
              "timing (first call compiles)...", flush=True)
        ms, loss, state = time_variant(name, state, ts, vbatch)
        # Loss-equality guard at the TRAINED state: at random init the
        # fine-level resampling amplifies fp rounding into bin flips, so
        # XLA-vs-kernel loss diffs there measure sampling noise, not bugs.
        loss_err = None
        if cfg.use_onepass_train:
            try:
                loss_err = check_step_loss(cfg, model, state, vbatch)
            except Exception as e:  # XLA ref step can OOM at big batches
                print(f"{name}: check_step_loss failed: {str(e)[:200]}",
                      flush=True)
        results[name] = dict(
            ms_per_step=round(ms * 1e3, 2),
            rays_per_sec=round(vbatch["rgb"].shape[0] / ms, 0),
            fwd_rgb_err_vs_xla=round(err, 5),
            fwd_depth_err_vs_xla=round(derr, 5),
            final_loss=round(loss, 5),
            total_wall_s=round(time.time() - t_start, 1),
        )
        if loss_err is not None:
            results[name]["step_loss_err_vs_xla"] = round(loss_err, 6)
        print(name, json.dumps(results[name]), flush=True)
    return results


def mip_cfg(**kw):
    from consistentnerf_tpu.configs import Config

    base = dict(
        backbone="mipnerf",
        mip_num_samples=96,
        mip_num_levels=2,
        N_rand=4096 - 4 * 256,
        disable_normals=True,
        white_bkgd=True,
        use_tensorboard=False,
        compute_dtype="bfloat16",
        use_hardmask=True,
        compute_depth_metrics=True,
        compute_mono_depth_metrics=True,
        dataset_type="blender",
    )
    base.update(kw)
    return Config(**base)


def run_mip_variants(names):
    """mip-backbone train step A/B: mip_xla, mip_fused[_t<tile>]."""
    import jax

    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import MipBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import step as step_lib

    scene = synthetic.make_scene(n_views=6, H=128, W=128).to_scene_data()
    results = {}
    for name in names:
        t_start = time.time()
        # `_tvnorm` (position-independent suffix on any mip variant):
        # the full regnerf3 regularizer set — TV-norm random-pose patch
        # rays + decayed weight + near/far annealing (the round-4 mip
        # POL recipe, RUNS_r4.md).
        tvnorm_kw = {}
        if "_tvnorm" in name:
            name_spec = name.replace("_tvnorm", "")
            tvnorm_kw = dict(
                depth_tvnorm_loss_mult=0.1, depth_tvnorm_decay=True,
                depth_tvnorm_maxstep=512,
                depth_tvnorm_loss_mult_start=400.0,
                depth_tvnorm_loss_mult_end=0.1, anneal_nearfar=True,
                load_random_rays=True,
            )
        else:
            name_spec = name
        if name_spec == "mip_xla":
            cfg = mip_cfg(**tvnorm_kw)
        elif name_spec.startswith("mip_onepass"):
            # mip_onepass[_big][_t<tile>][_nopdfk][_dnoise]: one-pass mip
            # megakernel step; `big` = 4x-ray batch-scaling probe;
            # `nopdfk` = XLA resampler instead of the fused pdf kernel;
            # `dnoise` = density_noise=1 (the paper's mipnerf3/regnerf3
            # presets) exercising the per-point logit-noise kernel row.
            spec = name_spec
            kw = dict(tvnorm_kw)
            if "_nopdfk" in spec:  # position-independent suffix
                spec = spec.replace("_nopdfk", "")
                kw["use_pdf_kernel"] = False
            if "_dnoise" in spec:
                spec = spec.replace("_dnoise", "")
                kw["density_noise"] = 1.0
            tile = int(spec.split("_t")[-1]) if "_t" in spec else 1024
            if "_big" in spec:
                kw["N_rand"] = 16384 - 4 * 256
            cfg = mip_cfg(use_fused_train=True, use_onepass_train=True,
                          fused_tile=tile, **kw)
        elif name_spec.startswith("mip_fused"):
            tile = int(name_spec.split("_t")[-1]) if "_t" in name_spec \
                else 1024
            cfg = mip_cfg(use_fused_train=True, fused_tile=tile,
                          **tvnorm_kw)
        else:
            raise ValueError(name)
        model = make_model(cfg)
        random_poses = None
        if cfg.load_random_rays:
            from consistentnerf_tpu.data.random_poses import (
                generate_random_poses,
            )

            random_poses = generate_random_poses(
                scene.poses[scene.i_train], n_poses=cfg.n_random_poses,
                pose_type=cfg.random_pose_type,
                radius=cfg.random_pose_radius,
            )
        batcher = MipBatcher(scene, cfg, random_poses=random_poses)
        batch = batcher.next_batch()
        n_rays = batch["rgb"].shape[0]
        state = loop_lib.init_state(cfg, model, batch)
        if cfg.use_fused_train and cfg.use_onepass_train:
            from consistentnerf_tpu.ops import fused_onepass

            assert fused_onepass.mip_onepass_supported(cfg), name
            ts = fused_onepass.build_onepass_mip_train_step(cfg,
                                                            donate=False)
        elif cfg.use_fused_train:
            from consistentnerf_tpu.ops.fused_train import (
                build_fused_mip_train_step,
            )

            ts = build_fused_mip_train_step(cfg, donate=False)
        else:
            ts = step_lib.build_train_step(model, cfg, donate=False)
        ms, loss, state = time_variant(name, state, ts, batch)
        loss_err = None
        if cfg.use_onepass_train:
            try:
                loss_err = check_step_loss_mip(cfg, model, state, batch)
            except Exception as e:
                print(f"{name}: check_step_loss_mip failed: "
                      f"{str(e)[:200]}", flush=True)
        results[name] = dict(
            ms_per_step=round(ms * 1e3, 2),
            rays_per_sec=round(n_rays / ms, 0),
            final_loss=round(loss, 5),
            total_wall_s=round(time.time() - t_start, 1),
        )
        if loss_err is not None:
            results[name]["step_loss_err_vs_xla"] = round(loss_err, 6)
        print(name, json.dumps(results[name]), flush=True)
    return results


def run_fwd_variants(names):
    """Time the train FORWARD alone (no grad/optimizer): fwd_xla, fwd_v2,
    fwd_v2_nopdf (det fine z: no sample_pdf / sort / PRNG)."""
    import jax
    import jax.numpy as jnp

    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import VanillaBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import step as step_lib

    results = {}
    scene = synthetic.make_scene(n_views=6, H=128, W=128).to_scene_data()
    for name in names:
        kw = {}
        if "nopdf" in name:
            kw = dict(perturb=0.0)
        if "v2" in name:
            kw.update(use_fused_train=True, fused_tile=1024,
                      fused_kernel="v2")
        cfg = flagship_cfg(**kw)
        model = make_model(cfg)
        batch = VanillaBatcher(scene, cfg).next_batch()
        state = loop_lib.init_state(cfg, model, batch)
        rays = step_lib.rays_from_batch(batch, cfg.near, cfg.far)

        if cfg.use_fused_train:
            from consistentnerf_tpu.ops.fused_train import (
                fused_vanilla_forward,
            )

            def fwd(params, rng, s):
                out = fused_vanilla_forward(
                    params, rng if cfg.perturb > 0 else None,
                    rays.replace(origins=rays.origins + s), cfg,
                    tile=cfg.fused_tile,
                )
                return out["rgb"].sum() + out["rgb0"].sum()

        else:

            def fwd(params, rng, s):
                out = model.apply(
                    params, rng if cfg.perturb > 0 else None,
                    rays.replace(origins=rays.origins + s),
                )
                return out["rgb"].sum() + out["rgb0"].sum()

        f = jax.jit(fwd)
        key = jax.random.PRNGKey(0)
        float(f(state.params, key, 0.0))
        REPS = 10
        best = float("inf")
        for trial in range(3):
            t0 = time.perf_counter()
            r = None
            for i in range(REPS):
                r = f(state.params, key, 1e-5 * (trial * REPS + i + 1))
            float(r)
            best = min(best, (time.perf_counter() - t0) / REPS)
        results[name] = {"fwd_ms": round(best * 1e3, 2)}
        print(name, json.dumps(results[name]), flush=True)
    return results


def run_render_variants(names):
    import jax
    import numpy as np

    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import VanillaBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import evaluation
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import render as render_lib

    from consistentnerf_tpu.data.pipeline import MipBatcher

    results = {}
    scene = synthetic.make_scene(n_views=6, H=128, W=128).to_scene_data()
    for name in names:
        # `_stack<k>` anywhere: render k distinct views in ONE dispatch
        # (train/render.py multi-view batching), report per-image time.
        # `_nopdfk` anywhere: XLA sample_pdf+sort instead of the fused
        # pdf+merge kernel. Order-independent parsing.
        full_name, n_stack = name, 1
        extra_kw = {}
        if "_nopdfk" in name:
            name = name.replace("_nopdfk", "")
            extra_kw["use_pdf_kernel"] = False
        if "_stack" in name:
            name, s_str = name.rsplit("_stack", 1)
            n_stack = int(s_str)
        kw = dict()
        if name == "render_fused":
            kw = dict(use_fused_render=True, compute_dtype="float32",
                      fused_tile=512)
        elif name == "render_fused_bf16":
            kw = dict(use_fused_render=True, fused_tile=512)
        elif name.startswith("render_onepass"):
            # render_onepass[_fp32][_t<tile>]: in-kernel compositing.
            kw = dict(use_fused_render=True, use_onepass_render=True,
                      fused_tile=512)
            if "_fp32" in name:
                kw["compute_dtype"] = "float32"
            if "_t" in name:
                kw["fused_tile"] = int(name.rsplit("_t", 1)[1])
        if name.startswith("render_mip"):
            cfg = mip_cfg(render_chunk_size=8192,
                          use_fused_render=name.endswith("fused"),
                          fused_tile=1024, **extra_kw)
            model = make_model(cfg)
            batch = MipBatcher(scene, cfg).next_batch()
        else:
            cfg = flagship_cfg(render_chunk_size=8192, **kw, **extra_kw)
            model = make_model(cfg)
            batch = VanillaBatcher(scene, cfg).next_batch()
        state = loop_lib.init_state(cfg, model, batch)
        render = render_lib.build_render_fn(model, cfg, state.params)
        if n_stack > 1:
            rays = render_lib.stack_rays([
                evaluation.camera_rays_for_view(scene, scene.poses[k])
                for k in range(n_stack)
            ])
        else:
            rays = evaluation.camera_rays_for_view(scene, scene.poses[0])
        out = render(rays)  # compile
        ref_rgb = np.asarray(out["rgb"])
        best = float("inf")
        for trial in range(3):
            # per-trial origin offset: identical repeated executions can
            # be served from a relay cache (CLAUDE.md timing caveats)
            t_rays = rays.replace(
                origins=rays.origins + 1e-6 * (trial + 1))
            t0 = time.perf_counter()
            out = render(t_rays)
            s = float(np.asarray(out["rgb"]).sum())
            best = min(best, time.perf_counter() - t0)
        n_rays = np.prod(rays.origins.shape[:-1]) // n_stack
        best = best / n_stack
        results[full_name] = dict(
            ms_per_image=round(best * 1e3, 2),
            rays_per_sec=round(n_rays / best, 0),
            checksum=round(s, 3),
        )
        print(full_name, json.dumps(results[full_name]), flush=True)
    return results


def run_kernel_micro(names):
    """Isolate the MLP fwd/bwd cost: fused Pallas kernel vs the XLA MLP
    on the flagship fine-level point count (5120 rays x 192 samples)."""
    import functools

    import jax
    import jax.numpy as jnp

    from consistentnerf_tpu.models.mlp import NeRFMLP
    from consistentnerf_tpu.ops import fused_mlp as fm
    from consistentnerf_tpu.ops.fused_mlp_train import fused_mlp_train

    # Coarse-level point count by default: the full fine-level (983k) XLA
    # grad graph trips a register-allocation RET_CHECK in this compiler
    # build. `_n983` variants run at the fine-level count.
    n = 5120 * 192 if any("n983" in m for m in names) else 5120 * 64
    mlp = NeRFMLP()
    pe, ve = 63, 27
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((2, pe)),
                      jnp.zeros((2, ve)))
    weights = tuple(
        w[None, :] if w.ndim == 1 else w
        for w in (jnp.asarray(x) for x in fm.flatten_params(params, True, 8))
    )
    pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    views = jax.random.normal(jax.random.PRNGKey(2), (n, 3))

    results = {}
    for name in names:
        if name == "k_null":
            # Dispatch-latency calibration: a trivial kernel.
            def fwd(ws):
                return ws[0] * 1.0

        elif name.startswith("k_fusedpad"):
            from consistentnerf_tpu.ops import fused_mlp_train as fmt

            cd = jnp.bfloat16 if "bf16" in name else jnp.float32
            tile = 512 if "512" in name else 256

            def fwd(ws, _t=tile, _cd=cd):
                return fmt._fwd_pallas(ws, pts, views, 8, (4,), 10, 4,
                                       _t, False, _cd, out_lanes=128)

        elif name.startswith(("k_v2", "k_h2")):
            from consistentnerf_tpu.ops.fused_mlp_v2 import (
                fused_mlp_v2_train,
                hybrid_mlp_v2_train,
            )

            base = (hybrid_mlp_v2_train if name.startswith("k_h2")
                    else fused_mlp_v2_train)
            cd = jnp.bfloat16 if "bf16" in name else jnp.float32
            tile = 512
            for t in ("512", "1024", "2048"):
                if f"t{t}" in name:
                    tile = int(t)

            def fwd(ws, _t=tile, _cd=cd, _b=base):
                return _b(ws, pts, views, 8, (4,), 10, 4, _t, False, _cd)

        elif name.startswith("k_fused"):
            cd = jnp.bfloat16 if "bf16" in name else jnp.float32
            tile = 512 if "512" in name else 256

            def fwd(ws, _t=tile, _cd=cd):
                return fused_mlp_train(ws, pts, views, 8, (4,), 10, 4,
                                       _t, False, _cd)

        elif name.startswith("k_xlarm"):
            # XLA fwd with jax.checkpoint: backward recomputes instead of
            # saving activations.
            cd = jnp.bfloat16 if "bf16" in name else jnp.float32

            @jax.checkpoint
            def fwd(ws, _cd=cd):
                flat = [w[0] if (w.ndim == 2 and w.shape[0] == 1) else w
                        for w in fm.cast_weight_list(list(ws), _cd)]
                return fm._mlp_body(
                    pts, views, flat, net_depth=8, skips=(4,), multires=10,
                    multires_views=4, use_viewdirs=True, compute_dtype=_cd,
                )

        elif name.startswith("k_xla"):
            cd = jnp.bfloat16 if "bf16" in name else jnp.float32

            def fwd(ws, _cd=cd):
                flat = [w[0] if (w.ndim == 2 and w.shape[0] == 1) else w
                        for w in fm.cast_weight_list(list(ws), _cd)]
                return fm._mlp_body(
                    pts, views, flat, net_depth=8, skips=(4,), multires=10,
                    multires_views=4, use_viewdirs=True, compute_dtype=_cd,
                )

        elif name.startswith("k_hybrid"):
            # XLA forward (huge-M matmuls at near-peak) + the Pallas
            # VMEM-recompute backward kernel.
            from consistentnerf_tpu.ops import fused_mlp_train as fmt

            cd = jnp.bfloat16 if "bf16" in name else jnp.float32
            tile = 512 if "512" in name else 256

            def fwd(ws, _t=tile, _cd=cd):
                return fmt.hybrid_mlp_train(ws, pts, views, 8, (4,), 10, 4,
                                            _t, False, _cd)

        else:
            raise ValueError(name)

        out = {}
        timers = []

        def _perturb(ws, s):
            # Distinct inputs per execute (fused scalar add): identical
            # re-executes are served from a relay cache (CLAUDE.md).
            return jax.tree_util.tree_map(lambda w: w + s, tuple(ws))

        try:
            f = jax.jit(lambda ws, s: fwd(_perturb(ws, s)))
            float(jnp.sum(f(weights, 0.0)))  # compile
            timers.append(("fwd_ms", f, lambda r: float(jnp.sum(r[:, 0]))))
            grad = jax.jit(
                jax.grad(lambda ws, s: jnp.sum(fwd(_perturb(ws, s)) ** 2))
            )
            jax.block_until_ready(grad(weights, 0.0))
            timers.append(
                ("fwdbwd_ms", grad, lambda r: float(jnp.sum(r[0])))
            )
        except Exception as e:  # compiler bugs / non-differentiable fwd
            out["error"] = f"{type(e).__name__}: {str(e)[:160]}"
        # Queue REPS executes per sync: per-execute host/relay latency
        # otherwise dominates (a null jit op measures ~3-5 ms per sync
        # through the remote relay).
        REPS = 10
        for label, fn, sync in timers:
            best = float("inf")
            for trial in range(3):
                t0 = time.perf_counter()
                r = None
                for _i in range(REPS):
                    r = fn(weights, 1e-5 * (trial * REPS + _i + 1))
                sync(r)
                best = min(best, time.perf_counter() - t0)
            out[label] = round(best * 1e3 / REPS, 2)
        results[name] = out
        print(name, json.dumps(out), flush=True)
    return results


def run_matmul_micro():
    """Raw MXU rates for the shapes the train step lives on (bf16,
    fp32 accumulation): fwd-style huge-M, bwd dX-style, and the dW
    reduction (tiny output, huge K) that dominates the backward."""
    import jax
    import jax.numpy as jnp

    K = 5120 * 64  # one coarse level's point count
    cases = {
        # (a_shape, b_shape, contract): flops = 2*prod
        "fwd_M327k": ((K, 256), (256, 256), "mn"),
        "fwd_skip_M327k": ((K, 319), (319, 256), "mn"),
        "dW_256x256": ((K, 256), (K, 256), "kk"),
        "dW_319x256": ((K, 319), (K, 256), "kk"),
        "dW_63x256": ((K, 63), (K, 256), "kk"),
    }
    results = {}
    for name, (sa, sb, mode) in cases.items():
        # A per-rep scalar perturbation (fused into the operand load by
        # XLA, so ~free) makes every execute's inputs distinct: the relay
        # serves identical re-executes from a cache and reports
        # impossible rates otherwise (see CLAUDE.md).
        a = jax.random.normal(jax.random.PRNGKey(0), sa, jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(99), sb, jnp.bfloat16)
        if mode == "mn":
            f = jax.jit(lambda a, b, s: jnp.dot(
                a + s, b, preferred_element_type=jnp.float32))
        else:
            f = jax.jit(lambda a, b, s: jax.lax.dot_general(
                a + s, b, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        flops = 2 * sa[0] * sa[1] * sb[1]
        float(jnp.sum(f(a, b, jnp.bfloat16(0))))  # compile + hard sync
        REPS = 16
        best = float("inf")
        for trial in range(3):
            t0 = time.perf_counter()
            r = None
            for i in range(REPS):
                s = jnp.bfloat16(1e-3 * (trial * REPS + i + 1))
                r = f(a, b, s)
            # float() hard sync: block_until_ready has returned early
            # through the relay (CLAUDE.md) and reported >peak TFLOPS.
            float(jnp.sum(r))
            best = min(best, (time.perf_counter() - t0) / REPS)
        results[name] = {
            "ms": round(best * 1e3, 3),
            "tflops": round(flops / best / 1e12, 1),
        }
        print(name, json.dumps(results[name]), flush=True)
    return results


def run_chain_micro(names):
    """Mosaic-vs-XLA matmul rate on the trunk's exact pattern: L chained
    [N,256]x[256,256] bf16 dots (fp32 accum). Big enough (>=0.5 TFLOP)
    to sit far above the ~3 ms per-execute relay floor."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, C, L = 262144, 256, 16
    flops = 2 * N * C * C * L
    ws = [
        jax.random.normal(jax.random.PRNGKey(i), (C, C), jnp.bfloat16)
        * 0.05
        for i in range(L)
    ]
    x = jax.random.normal(jax.random.PRNGKey(99), (N, C), jnp.bfloat16)

    results = {}
    for name in names:
        if name == "c_xla":

            def fn(x, s):
                h = x + s
                for w in ws:
                    h = jnp.dot(
                        h, w, preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                return h

        elif name == "c_xla_nocast":

            def fn(x, s):
                h = x + s
                for w in ws:
                    h = jnp.dot(h, w)  # bf16 accumulate
                return h

        elif name.startswith("c_sinx"):
            # XLA: one sin pass over the input, then the chain.
            def fn(x, s):
                h = jnp.sin((x + s).astype(jnp.float32)).astype(
                    jnp.bfloat16
                )
                for w in ws:
                    h = jnp.dot(
                        h, w, preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                return h

        elif name == "c_pallas_pe":
            # The fused kernel's ACTUAL entry: 21-piece posenc concat +
            # a [tile,63]x[63,256] odd-K dot, then the aligned chain.
            from consistentnerf_tpu.ops import fused_mlp as fm

            w0 = jax.random.normal(jax.random.PRNGKey(100), (63, C),
                                   jnp.bfloat16) * 0.05
            tile = 512

            def kernel(x_ref, w0_ref, *refs):
                *w_refs, o_ref = refs
                e = fm._posenc(x_ref[:, :3].astype(jnp.float32), 10)
                h = jnp.dot(
                    e.astype(jnp.bfloat16), w0_ref[:],
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                for w_ref in w_refs:
                    h = jnp.dot(
                        h, w_ref[:], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                o_ref[:] = h

            x8 = jax.random.normal(jax.random.PRNGKey(7), (N, 8),
                                   jnp.bfloat16)

            def fn(x, s, _t=tile):
                return pl.pallas_call(
                    kernel,
                    grid=(N // _t,),
                    in_specs=[
                        pl.BlockSpec((_t, 8), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((63, C), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ] + [
                        pl.BlockSpec((C, C), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(L - 1)
                    ],
                    out_specs=pl.BlockSpec((_t, C), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
                )(x8 + s, w0, *ws[: L - 1])

        elif name == "c_pallas_pe2":
            # The PRODUCTION entry (fused_mlp_v2 packed PE): one
            # [tile,3]x[3,128] dot + bias + ONE sin pass, then a
            # [tile,128]x[128,256] first dot and the aligned chain —
            # measures the real kernel's entry overhead (c_pallas_pe
            # measures the superseded 21-piece-concat entry).
            from consistentnerf_tpu.ops import fused_mlp_v2 as v2mod

            F = jnp.asarray(v2mod._freq_matrix(10), jnp.float32)  # [3,128]
            w0 = jax.random.normal(jax.random.PRNGKey(100), (128, C),
                                   jnp.bfloat16) * 0.05
            tile = 512

            def kernel(x_ref, f_ref, w0_ref, *refs):
                *w_refs, o_ref = refs
                p = jnp.dot(x_ref[:, :3].astype(jnp.float32), f_ref[:],
                            preferred_element_type=jnp.float32
                            ) + v2mod._phase_bias()
                sc = jnp.sin(p).astype(jnp.bfloat16)
                h = jnp.dot(sc, w0_ref[:],
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
                for w_ref in w_refs:
                    h = jnp.dot(
                        h, w_ref[:], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                o_ref[:] = h

            x8 = jax.random.normal(jax.random.PRNGKey(7), (N, 8),
                                   jnp.bfloat16)

            def fn(x, s, _t=tile):
                return pl.pallas_call(
                    kernel,
                    grid=(N // _t,),
                    in_specs=[
                        pl.BlockSpec((_t, 8), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((3, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((128, C), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ] + [
                        pl.BlockSpec((C, C), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(L - 1)
                    ],
                    out_specs=pl.BlockSpec((_t, C), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
                )(x8 + s, F, w0, *ws[: L - 1])

        elif name.startswith("c_dual") or name.startswith("c_quad"):
            # c_dual_t<tile> / c_quad_t<tile>: the tile split into 2/4
            # independent column chunks with the LAYER loop outermost —
            # adjacent matmuls carry no data dependency. If the single
            # chain's ~88 TFLOPS is MXU pipeline fill/drain on the
            # dependent chain, this should exceed it; if Mosaic
            # serializes matmuls regardless, it won't. Decides whether
            # stream-interleaving the real kernel is worth re-attacking.
            nstreams = 2 if name.startswith("c_dual") else 4
            tile = int(name.split("_t")[-1]) if "_t" in name else 512

            def kernel(x_ref, *refs, _ns=nstreams, _t=tile):
                *w_refs, o_ref = refs
                chunk = _t // _ns
                hs = [x_ref[c * chunk:(c + 1) * chunk, :]
                      for c in range(_ns)]
                for w_ref in w_refs:
                    w = w_ref[:]
                    hs = [
                        jnp.dot(h, w,
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
                        for h in hs
                    ]
                for c in range(_ns):
                    o_ref[c * chunk:(c + 1) * chunk, :] = hs[c]

            def fn(x, s, _t=tile):
                return pl.pallas_call(
                    kernel,
                    grid=(N // _t,),
                    in_specs=[
                        pl.BlockSpec((_t, C), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ] + [
                        pl.BlockSpec((C, C), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(L)
                    ],
                    out_specs=pl.BlockSpec((_t, C), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
                )(x + s, *ws)

        elif name.startswith("c_pallas"):
            tile = int(name.split("_t")[-1]) if "_t" in name else 512
            with_sin = "sin" in name

            def kernel(x_ref, *refs, _ws=with_sin):
                *w_refs, o_ref = refs
                h = x_ref[:]
                if _ws:
                    # isolate Mosaic's transcendental cost (the fused MLP
                    # kernel computes ~120 sin/cos per point for the PE)
                    h = jnp.sin(h.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )
                for w_ref in w_refs:
                    h = jnp.dot(
                        h, w_ref[:], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                o_ref[:] = h

            def fn(x, s, _t=tile):
                return pl.pallas_call(
                    kernel,
                    grid=(N // _t,),
                    in_specs=[
                        pl.BlockSpec((_t, C), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ] + [
                        pl.BlockSpec((C, C), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(L)
                    ],
                    out_specs=pl.BlockSpec((_t, C), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
                )(x + s, *ws)

        else:
            raise ValueError(name)

        f = jax.jit(fn)
        float(jnp.sum(f(x, jnp.bfloat16(0))))  # compile + hard sync
        REPS = 10
        best = float("inf")
        for trial in range(3):
            t0 = time.perf_counter()
            r = None
            for i in range(REPS):
                r = f(x, jnp.bfloat16(1e-3 * (trial * REPS + i + 1)))
            # float() hard sync (block_until_ready returns early through
            # the relay — CLAUDE.md timing caveats).
            float(jnp.sum(r))
            best = min(best, (time.perf_counter() - t0) / REPS)
        results[name] = {
            "ms": round(best * 1e3, 2),
            "tflops": round(flops / best / 1e12, 1),
        }
        print(name, json.dumps(results[name]), flush=True)
    return results


def main():
    setup_jax()
    args = sys.argv[1:] or ["xla", "fused_fp32", "fused_bf16",
                            "fused_bf16_t512"]
    mip_names = [a for a in args if a.startswith("mip_")]
    train_names = [a for a in args
                   if not a.startswith(("render", "k_", "c_", "fwd_",
                                        "mip_", "traj_"))]
    traj_names = [a for a in args if a.startswith("traj_")]
    render_names = [a for a in args if a.startswith("render")]
    fwd_names = [a for a in args if a.startswith("fwd_")]
    kernel_names = [a for a in args
                    if a.startswith("k_") and a != "k_matmul"]
    out = {}
    if traj_names:
        out.update(run_trajectory_check(traj_names))
    if train_names:
        out.update(run_train_variants(train_names))
    if mip_names:
        out.update(run_mip_variants(mip_names))
    if fwd_names:
        out.update(run_fwd_variants(fwd_names))
    if render_names:
        out.update(run_render_variants(render_names))
    if kernel_names:
        out.update(run_kernel_micro(kernel_names))
    if "k_matmul" in args:
        out.update(run_matmul_micro())
    chain_names = [a for a in args if a.startswith("c_")]
    if chain_names:
        out.update(run_chain_micro(chain_names))
    print("SUMMARY " + json.dumps(out))


if __name__ == "__main__":
    main()
