"""The jitted SPMD train step for both backbones.

One XLA program per step: forward (both levels), losses, backward, gradient
conditioning, Adam update. Batches arrive sharded along the ray axis over
the mesh's 'data' axis; parameters are replicated; XLA inserts the gradient
all-reduce over ICI (the explicit `lax.pmean` of `RegNeRF/train.py:246-253`
disappears into the partitioner).

Schedules that the reference computed host-side per step (lr, resample
padding, tvnorm weight, soft-mask temperature — `train.py:374-395`,
`run_nerf_view.py:1419-1420,1989`) are evaluated inside the step from
`state.step`, so the host never blocks on scalar traffic.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from consistentnerf_tpu.consistency import masks as mask_mod
from consistentnerf_tpu.core import mathx
from consistentnerf_tpu.core.rays import Rays
from consistentnerf_tpu.parallel import mesh as mesh_lib
from consistentnerf_tpu.train import losses as losses_lib
from consistentnerf_tpu.train.state import TrainState, make_optimizer


def rays_from_batch(batch: Dict[str, jnp.ndarray], near, far) -> Rays:
    """Assemble a Rays bundle from flat batch arrays (vanilla trainer)."""
    d = batch["directions"]
    ones = jnp.ones_like(d[..., :1])
    viewdirs = batch.get(
        "viewdirs", d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    )
    return Rays(
        origins=batch["origins"],
        directions=d,
        viewdirs=viewdirs,
        radii=batch.get("radii", ones * 1e-3),
        lossmult=ones,
        near=ones * near,
        far=ones * far,
    )


def apply_output_noise(outputs, cfg, step_rng):
    """Gaussian noise on predictions before the losses
    (run_nerf_view.py:1633-1638). The reference's
    Temp_Scheduler(total_iters, 0.2, 0.05, temp_min=0.05) decays from
    its base_temp *argument* (0.05), so the effective reference std is
    constant 0.05 — matched here. Shared by the XLA and fused steps."""
    std = jnp.asarray(0.05)
    nk = jax.random.split(jax.random.fold_in(step_rng, 7), 4)
    outputs = dict(outputs)
    outputs["rgb"] = outputs["rgb"] + std * jax.random.normal(
        nk[0], outputs["rgb"].shape
    )
    outputs["depth"] = outputs["depth"] + cfg.far * std * (
        jax.random.normal(nk[1], outputs["depth"].shape)
    )
    if "rgb0" in outputs:
        outputs["rgb0"] = outputs["rgb0"] + std * (
            jax.random.normal(nk[2], outputs["rgb0"].shape)
        )
        outputs["depth0"] = outputs["depth0"] + cfg.far * std * (
            jax.random.normal(nk[3], outputs["depth0"].shape)
        )
    return outputs


def apply_ss_loss(model_or_apply, params, step_rng, batch, cfg, outputs,
                  loss, stats):
    """Fold the online-reprojection ss_loss term into (loss, stats).

    Renders the reference rays (via the module's apply or a bare
    apply_fn — the fused step passes its kernel-backed forward) and
    applies the stochastic gating of the main RGB loss between the full
    and consistency-masked variants (run_nerf_view_test.py:944-967
    random.randint(0, 1) semantics). Shared by the XLA and fused steps.
    """
    from consistentnerf_tpu.consistency import online

    ss_rng, gate_rng = jax.random.split(jax.random.fold_in(step_rng, 1))
    ss, aux = online.online_reprojection_loss(
        model_or_apply, params, ss_rng if cfg.perturb > 0 else None,
        batch, cfg,
    )
    gated = mask_mod.masked_mse(
        outputs["rgb"], batch["rgb"], aux["consistency_weight"]
    )
    use_gated = jax.random.bernoulli(gate_rng)
    scale = batch.get("loss_scale", jnp.array(1.0))
    loss = (
        loss
        - scale * stats["img_loss"]
        + scale * jnp.where(use_gated, gated, stats["img_loss"])
        + cfg.ss_loss_mult * ss
    )
    stats["ss_loss"] = ss
    stats["loss"] = loss
    return loss, stats


def build_vanilla_train_step(
    model,
    cfg,
    tx: Optional[optax.GradientTransformation] = None,
    lpips_params: Optional[Any] = None,
    donate: bool = True,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, stats) [jitted]."""
    tx = tx or make_optimizer(cfg)

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        temp = mask_mod.temp_schedule(
            state.step, cfg.total_iters, cfg.temp_start, cfg.temp_end
        )
        rays = rays_from_batch(batch, cfg.near, cfg.far)

        def loss_fn(params):
            outputs = model.apply(
                params, step_rng if cfg.perturb > 0 else None, rays
            )
            if cfg.use_noise:
                outputs = apply_output_noise(outputs, cfg, step_rng)
            loss, stats = losses_lib.vanilla_losses(
                outputs, batch, cfg, cfg.far, temp, lpips_params
            )
            if cfg.ss_loss and "ref_image" in batch:
                loss, stats = apply_ss_loss(
                    model, params, step_rng, batch, cfg, outputs, loss,
                    stats,
                )
            return loss, stats

        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        stats["grad_norm"] = losses_lib.tree_norm(grads)
        stats["lr"] = mathx.exp_lr_decay(
            state.step, cfg.lrate, 0.1, cfg.lrate_decay * 1000
        )
        return (
            TrainState(step=state.step + 1, params=params,
                       opt_state=opt_state),
            stats,
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def build_mip_train_step(
    model,
    cfg,
    tx: Optional[optax.GradientTransformation] = None,
    donate: bool = True,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, stats) [jitted]."""
    tx = tx or make_optimizer(cfg)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        key, key2 = jax.random.split(rng)

        frac = state.step / cfg.total_iters
        resample_padding = mathx.log_lerp(
            frac, cfg.resample_padding_init, cfg.resample_padding_final
        )
        if cfg.depth_tvnorm_decay:
            tvnorm_loss_weight = mathx.compute_tvnorm_weight(
                state.step, cfg.depth_tvnorm_maxstep,
                cfg.depth_tvnorm_loss_mult_start,
                cfg.depth_tvnorm_loss_mult_end,
            )
        else:
            tvnorm_loss_weight = cfg.depth_tvnorm_loss_mult

        render_random = (
            (cfg.depth_tvnorm_loss_mult != 0.0) or cfg.depth_tvnorm_decay
        ) and ("rays_random" in batch)

        def loss_fn(params):
            renderings = model.apply(
                params,
                key if cfg.randomized else None,
                batch["rays"],
                resample_padding=resample_padding,
                compute_extras=(cfg.compute_disp_metrics
                                or cfg.compute_normal_metrics),
            )
            renderings_random = None
            if render_random:
                renderings_random = model.apply(
                    params,
                    key2 if cfg.randomized else None,
                    batch["rays_random"],
                    resample_padding=resample_padding,
                    compute_extras=True,
                )
            return losses_lib.mip_losses(
                renderings, renderings_random, batch, params, cfg,
                tvnorm_loss_weight,
            )

        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        stats["grad_norm"] = losses_lib.tree_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        stats["lr"] = mathx.learning_rate_decay(
            state.step, cfg.lr_init, cfg.lr_final, cfg.total_iters,
            cfg.lr_delay_steps, cfg.lr_delay_mult,
        )
        return (
            TrainState(step=state.step + 1, params=params,
                       opt_state=opt_state),
            stats,
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def build_train_step(model, cfg, **kw):
    if cfg.backbone == "vanilla":
        return build_vanilla_train_step(model, cfg, **kw)
    return build_mip_train_step(model, cfg, **kw)
