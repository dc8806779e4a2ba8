"""Train state and optimizer construction.

Optimizer semantics match the reference trainers:

* vanilla: Adam(5e-4) with lr x0.1^(step/250k) decay and gradient *value*
  clipping at 0.1 (`run_nerf_view.py:329,1982-1993`),
* mip/RegNeRF: Adam with log-lerp lr decay + sine warmup, NaN scrub, value
  clip, global-norm clip (`RegNeRF/train.py:256-275`, `math.py:134-166`).

Built as an optax chain with the schedule resolved from the config, so the
whole update is part of the one jitted train step.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from consistentnerf_tpu.core import mathx


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: flax.core.FrozenDict
    opt_state: optax.OptState


def _scrub_nans() -> optax.GradientTransformation:
    """jnp.nan_to_num over grads (RegNeRF check_grad_for_nans, train.py:256)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(jnp.nan_to_num, updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_lr_schedule(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if cfg.backbone == "vanilla":
        return lambda count: mathx.exp_lr_decay(
            count, cfg.lrate, 0.1, cfg.lrate_decay * 1000
        )
    return lambda count: mathx.learning_rate_decay(
        count,
        cfg.lr_init,
        cfg.lr_final,
        cfg.total_iters,
        cfg.lr_delay_steps,
        cfg.lr_delay_mult,
    )


def make_optimizer(cfg) -> optax.GradientTransformation:
    parts = []
    if cfg.check_grad_for_nans:
        parts.append(_scrub_nans())
    if cfg.grad_max_val > 0:
        parts.append(optax.clip(cfg.grad_max_val))
    if cfg.grad_max_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_max_norm))
    parts.append(
        optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps)
    )
    parts.append(optax.scale_by_schedule(make_lr_schedule(cfg)))
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)


def create_train_state(cfg, params, tx: Optional[optax.GradientTransformation] = None) -> TrainState:
    tx = tx or make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def sync_coarse_from_fine(params):
    """Vanilla trainer quirk: the coarse MLP starts as a copy of the fine
    MLP (`run_nerf_view.py:321` — model.load_state_dict(model_fine...))."""
    params = flax.core.unfreeze(params)
    if "coarse" in params["params"] and "fine" in params["params"]:
        # Materialize fresh buffers: aliased leaves break argument donation
        # in the jitted train step (XLA rejects donating a buffer twice).
        params["params"]["coarse"] = jax.tree_util.tree_map(
            jnp.array, params["params"]["fine"]
        )
    return flax.core.freeze(params)
