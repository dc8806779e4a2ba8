"""Training harness: setup, loop, logging, checkpointing, periodic eval.

One loop serves both backbones (the reference has two:
`run_nerf_view.py:1424-2127` and `RegNeRF/train.py:297-569`). Throughput is
logged as rays/sec exactly like the reference (`train.py:416-419`).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.data.pipeline import (
    AllImagesBatcher,
    MipBatcher,
    Prefetcher,
    VanillaBatcher,
)
from consistentnerf_tpu.data.scene import SceneData
from consistentnerf_tpu.models.factory import make_model
from consistentnerf_tpu.parallel import create_mesh, shard_batch
from consistentnerf_tpu.train import step as step_lib
from consistentnerf_tpu.train.checkpoints import CheckpointManager
from consistentnerf_tpu.train.state import (
    create_train_state,
    make_optimizer,
    sync_coarse_from_fine,
)


@dataclasses.dataclass
class TrainResult:
    state: object
    stats_history: list
    rays_per_sec: float


def make_batcher(scene: SceneData, cfg: Config, random_poses=None):
    if cfg.backbone == "mipnerf":
        return MipBatcher(scene, cfg, random_poses=random_poses)
    if cfg.use_batching:
        return AllImagesBatcher(scene, cfg)
    return VanillaBatcher(scene, cfg)


def init_state(cfg: Config, model, example_batch, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    if cfg.backbone == "vanilla":
        rays = step_lib.rays_from_batch(example_batch, cfg.near, cfg.far)
        sample = jax.tree_util.tree_map(lambda x: x[:8], rays)
        params = model.init(rng, None, sample)
        params = sync_coarse_from_fine(params)
    else:
        sample = jax.tree_util.tree_map(
            lambda x: x[:8], example_batch["rays"]
        )
        params = model.init(rng, None, sample, 0.01, False)
    return create_train_state(cfg, params)


def select_train_step(cfg, model, mesh=None, lpips_params=None,
                      donate: bool = True):
    """The production step dispatch: one-pass megakernel where the
    config's exact loss is supported, two-call fused otherwise, XLA
    fallback. Shared by the training loop and bench.py so a gate change
    cannot make the benchmark measure a different path than training."""
    if cfg.use_fused_train and cfg.backbone == "vanilla":
        from consistentnerf_tpu.ops import fused_onepass

        if cfg.use_onepass_train and fused_onepass.onepass_supported(cfg):
            return fused_onepass.build_onepass_vanilla_train_step(
                cfg, lpips_params=lpips_params, mesh=mesh, donate=donate
            )
        from consistentnerf_tpu.ops.fused_train import (
            build_fused_vanilla_train_step,
        )

        return build_fused_vanilla_train_step(
            cfg, lpips_params=lpips_params, mesh=mesh, donate=donate
        )
    if cfg.backbone == "vanilla":
        return step_lib.build_vanilla_train_step(
            model, cfg, lpips_params=lpips_params, donate=donate
        )
    if cfg.use_fused_train and cfg.backbone == "mipnerf":
        if not cfg.disable_normals:
            raise ValueError(
                "use_fused_train with the mip backbone requires "
                "disable_normals=true (normals need per-point density "
                "grads; use the XLA step for normal metrics)"
            )
        from consistentnerf_tpu.ops import fused_onepass

        if (cfg.use_onepass_train
                and fused_onepass.mip_onepass_supported(cfg)):
            return fused_onepass.build_onepass_mip_train_step(
                cfg, mesh=mesh, donate=donate
            )
        from consistentnerf_tpu.ops.fused_train import (
            build_fused_mip_train_step,
        )

        return build_fused_mip_train_step(cfg, mesh=mesh, donate=donate)
    return step_lib.build_train_step(model, cfg, donate=donate)


def train(
    cfg: Config,
    scene: SceneData,
    num_steps: Optional[int] = None,
    random_poses=None,
    callbacks: Optional[Dict[str, Callable]] = None,
    use_prefetch: bool = True,
    log_fn: Callable[[str], None] = print,
) -> TrainResult:
    """Run (or resume) training; returns final state + throughput."""
    num_steps = num_steps or cfg.total_iters
    callbacks = callbacks or {}

    mesh = create_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
    model = make_model(cfg)
    batcher = make_batcher(scene, cfg, random_poses)
    example = batcher.next_batch()

    state = init_state(cfg, model, example)

    ckpt_dir = os.path.join(cfg.basedir, cfg.expname, "checkpoints")
    ckpt = CheckpointManager(ckpt_dir, keep=cfg.checkpoint_keep)
    state = ckpt.restore(state)
    start_step = int(state.step)

    # Train-time patch LPIPS (run_nerf_view.py:1726-1728, weight +0.005):
    # engage it only when CALIBRATED weights are present. A random-init
    # trunk is actively harmful as a loss (measured -6 dB held-out PSNR
    # on the flagship synthetic run), so a missing file warns and skips.
    lpips_params = None
    if cfg.backbone == "vanilla" and cfg.lpips_weights_path:
        from consistentnerf_tpu.train import lpips as lpips_mod

        _lp = lpips_mod.LPIPS(cfg.lpips_weights_path)
        if _lp.is_calibrated:
            lpips_params = _lp.params
        else:
            log_fn(
                f"WARNING: lpips_weights_path={cfg.lpips_weights_path!r} "
                "not found; SKIPPING the train-time LPIPS term (a random-"
                "init perceptual loss degrades quality; export calibrated "
                "weights with cli/export_lpips_weights.py)"
            )

    train_step = select_train_step(cfg, model, mesh=mesh,
                                   lpips_params=lpips_params)
    rng = jax.random.PRNGKey(cfg.seed + jax.process_index())

    source: Iterator = Prefetcher(batcher) if use_prefetch else batcher

    writer = None
    if cfg.use_tensorboard and jax.process_index() == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(
                os.path.join(cfg.basedir, cfg.expname, "runs")
            )
        except Exception:
            writer = None

    stats_history = []
    t0 = time.time()
    rays_per_sec = 0.0
    batch_rays = example["rgb"].shape[0]

    # Loop-efficiency GC pinning (RegNeRF train.py:366,407-408).
    import gc

    gc_was_enabled = gc.isenabled()
    gc.disable()

    profiling = False
    for step_i in range(start_step, num_steps):
        if cfg.gc_every > 0 and (step_i + 1) % cfg.gc_every == 0:
            gc.collect()
        # Profiler hook: capture a trace of the first cfg.profile_steps
        # steps (the reference only had wall-clock counters; SURVEY §5).
        if cfg.profile_steps > 0 and step_i == start_step + 1:
            jax.profiler.start_trace(
                cfg.profile_dir
                or os.path.join(cfg.basedir, cfg.expname, "profile")
            )
            profiling = True
        if profiling and step_i == start_step + 1 + cfg.profile_steps:
            jax.profiler.stop_trace()
            profiling = False
        batch = next(source)
        batch = shard_batch(batch, mesh)
        state, stats = train_step(state, batch, rng)

        if (step_i + 1) % cfg.i_print == 0:
            stats = jax.device_get(stats)
            dt = time.time() - t0
            rays_per_sec = cfg.i_print * batch_rays / dt
            t0 = time.time()
            stats_history.append({k: np.asarray(v) for k, v in stats.items()})
            psnr = float(np.asarray(stats.get("psnr", np.nan)))
            log_fn(
                f"step {step_i + 1}/{num_steps} "
                f"loss={float(np.asarray(stats['loss'])):.4f} "
                f"psnr={psnr:.2f} {rays_per_sec:,.0f} rays/sec"
            )
            if writer is not None:
                for k, v in stats.items():
                    v = np.asarray(v)
                    if v.ndim == 0:
                        writer.add_scalar(f"train_{k}", float(v), step_i + 1)
                writer.add_scalar("train_rays_per_sec", rays_per_sec,
                                  step_i + 1)

        if (step_i + 1) % cfg.checkpoint_every == 0 or step_i + 1 == num_steps:
            ckpt.save(step_i + 1, jax.device_get(state))

        if (
            cfg.train_render_every > 0
            and (step_i + 1) % cfg.train_render_every == 0
            and jax.process_index() == 0
            and len(scene.i_test) > 0
        ):
            # Periodic held-out render (RegNeRF train.py:492-564).
            from consistentnerf_tpu.train import evaluation

            tm = evaluation.evaluate(
                model,
                cfg,
                jax.device_get(state).params,
                scene,
                out_dir=os.path.join(cfg.basedir, cfg.expname,
                                     "train_renders"),
                views=scene.i_test[:1],
                step=step_i + 1,
            )
            log_fn(f"  test render @ {step_i + 1}: " + ", ".join(
                f"{k}={v:.3f}" for k, v in sorted(tm.items())
            ))
            if writer is not None:
                for k, v in tm.items():
                    writer.add_scalar(f"test_{k}", v, step_i + 1)

        if "on_step" in callbacks:
            callbacks["on_step"](step_i, state)

    if profiling:
        jax.profiler.stop_trace()
    if gc_was_enabled:
        gc.enable()
    if isinstance(source, Prefetcher):
        source.close()
    ckpt.wait()
    if writer is not None:
        writer.close()
    return TrainResult(
        state=state, stats_history=stats_history, rays_per_sec=rays_per_sec
    )
