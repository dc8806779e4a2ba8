"""Vanilla train step built on the custom-VJP fused MLP kernel.

Drop-in alternative to `train.step.build_vanilla_train_step`: identical
batch contract, state, losses and schedules, but both MLP evaluations run
through `ops.fused_mlp_train` (Pallas forward + Pallas backward with
in-VMEM activation recompute). Enabled with `Config.use_fused_train`.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from consistentnerf_tpu.consistency import masks as mask_mod
from consistentnerf_tpu.core import mathx, rendering, sampling
from consistentnerf_tpu.ops import fused_mlp as fm
from consistentnerf_tpu.ops.fused_mlp_train import fused_mlp_train
from consistentnerf_tpu.train import losses as losses_lib
from consistentnerf_tpu.train import step as step_lib
from consistentnerf_tpu.train.state import TrainState, make_optimizer


def _weights_tuple(params, branch, net_depth):
    p = params["params"][branch]
    ws = fm.flatten_params({"params": p}, True, net_depth)
    return tuple(w[None, :] if w.ndim == 1 else w for w in ws)


def fused_vanilla_forward(params, rng, rays, cfg, tile: int = 256,
                          interpret: bool | None = None):
    """VanillaNeRF.__call__ semantics with fused MLP evals."""
    origins, directions, viewdirs = rays.origins, rays.directions, rays.viewdirs
    near, far = rays.near, rays.far
    n = origins.shape[0]

    keys = {}
    if rng is not None:
        names = ["coarse_strat", "pdf"]
        splits = jax.random.split(rng, len(names))
        keys = dict(zip(names, splits))

    kind = getattr(cfg, "fused_kernel", "v2")
    if kind == "v2":
        from consistentnerf_tpu.ops.fused_mlp_v2 import fused_mlp_v2_train

        base = fused_mlp_v2_train
    elif kind == "hybrid":
        from consistentnerf_tpu.ops.fused_mlp_train import hybrid_mlp_train

        base = hybrid_mlp_train
    else:
        base = fused_mlp_train
    kern = functools.partial(
        base,
        net_depth=cfg.netdepth,
        skips=(4,),
        multires=cfg.multires,
        multires_views=cfg.multires_views,
        tile=tile,
        interpret=interpret,
        compute_dtype=jnp.dtype(cfg.compute_dtype).type,
    )

    def eval_level(branch, z_vals):
        pts = (
            origins[..., None, :]
            + directions[..., None, :] * z_vals[..., :, None]
        )
        s = pts.shape[1]
        pts_flat = pts.reshape(n * s, 3)
        views_flat = jnp.broadcast_to(
            viewdirs[:, None, :], (n, s, 3)
        ).reshape(n * s, 3)
        ws = _weights_tuple(params, branch, cfg.netdepth)
        raw = kern(ws, pts_flat, views_flat)
        return raw.reshape(n, s, 4)

    t_rand = None
    if rng is not None and cfg.perturb > 0:
        t_rand = jax.random.uniform(
            keys["coarse_strat"], (n, cfg.N_samples)
        )
    z_vals = sampling.vanilla_z_vals(
        near, far, cfg.N_samples, cfg.lindisp, t_rand
    )
    raw = eval_level("coarse", z_vals)
    rgb, disp, acc, weights, depth = rendering.raw2outputs(
        raw, z_vals, directions, None, cfg.white_bkgd
    )

    out = {}
    if cfg.N_importance > 0:
        out.update(rgb0=rgb, disp0=disp, acc0=acc, depth0=depth)
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sampling.sample_pdf(
            z_mid,
            weights[..., 1:-1],
            cfg.N_importance,
            rng=keys.get("pdf"),
            det=(rng is None or not cfg.perturb),
        )
        z_samples = jax.lax.stop_gradient(z_samples)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
        raw = eval_level("fine", z_all)
        rgb, disp, acc, weights, depth = rendering.raw2outputs(
            raw, z_all, directions, None, cfg.white_bkgd
        )
        out["z_std"] = jnp.std(z_samples, axis=-1)
    out.update(rgb=rgb, disp=disp, acc=acc, depth=depth)
    return out


def build_fused_vanilla_train_step(
    cfg,
    tx: Optional[optax.GradientTransformation] = None,
    donate: bool = True,
    tile: Optional[int] = None,
    lpips_params=None,
) -> Callable:
    """train_step(state, batch, rng) -> (state, stats), fused-kernel MLPs."""
    tx = tx or make_optimizer(cfg)
    tile = tile or cfg.fused_tile

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        temp = mask_mod.temp_schedule(
            state.step, cfg.total_iters, cfg.temp_start, cfg.temp_end
        )
        rays = step_lib.rays_from_batch(batch, cfg.near, cfg.far)

        def loss_fn(params):
            outputs = fused_vanilla_forward(
                params, step_rng if cfg.perturb > 0 else None, rays, cfg,
                tile=tile,
            )
            return losses_lib.vanilla_losses(
                outputs, batch, cfg, cfg.far, temp, lpips_params
            )

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
