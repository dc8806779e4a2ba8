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
from consistentnerf_tpu.ops import pdf_merge
from consistentnerf_tpu.ops.fused_mlp_train import fused_mlp_train
from consistentnerf_tpu.train import losses as losses_lib
from consistentnerf_tpu.train import step as step_lib
from consistentnerf_tpu.train.state import TrainState, make_optimizer


def _weights_tuple(params, branch, net_depth):
    p = params["params"][branch]
    ws = fm.flatten_params({"params": p}, True, net_depth)
    return tuple(w[None, :] if w.ndim == 1 else w for w in ws)


def _shard_map_kernel(kern, mesh, n_point_args):
    """Partition a transposed-stream kernel call over the mesh's data
    axis with shard_map: weights replicated (their cotangents are
    psum'ed by shard_map's transpose), point streams [C, N] split on
    dim 1, each device padding/tiling its local shard independently.

    Without this, the SPMD partitioner sees an opaque tpu_custom_call
    and replicates its operands — an all-gather of the whole batch per
    step on real multi-chip topologies."""
    from jax.sharding import PartitionSpec as P

    data = P(None, "data")
    # check_vma=False: the pallas_call's out ShapeDtypeStruct carries no
    # varying-mesh-axes annotation.
    return jax.shard_map(
        kern, mesh=mesh,
        in_specs=(P(),) + (data,) * n_point_args,
        out_specs=data,
        check_vma=False,
    )


def fused_vanilla_forward(params, rng, rays, cfg, tile: int = 256,
                          interpret: bool | None = None, mesh=None):
    """VanillaNeRF.__call__ semantics with fused MLP evals.

    mesh: optional jax.sharding.Mesh with a 'data' axis; when it spans
    more than one device the kernel calls run under shard_map (see
    _shard_map_kernel)."""
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
        from consistentnerf_tpu.ops.fused_mlp_v2 import fused_mlp_v2_train_T

        base = fused_mlp_v2_train_T
    elif kind == "v2row":
        from consistentnerf_tpu.ops.fused_mlp_v2 import fused_mlp_v2_train

        base = fused_mlp_v2_train
    elif kind == "v2h":
        from consistentnerf_tpu.ops.fused_mlp_v2 import hybrid_mlp_v2_train

        base = hybrid_mlp_v2_train
    elif kind == "hybrid":
        from consistentnerf_tpu.ops.fused_mlp_train import hybrid_mlp_train

        base = hybrid_mlp_train
    else:
        base = fused_mlp_train
    extra = {}
    if kind == "v2" and getattr(cfg, "fused_fwd_tile", 0):
        extra["fwd_tile"] = cfg.fused_fwd_tile
    if kind == "v2" and getattr(cfg, "fused_fwd_streams", 1) > 1:
        extra["fwd_streams"] = cfg.fused_fwd_streams
    kern = functools.partial(
        base,
        net_depth=cfg.netdepth,
        skips=(4,),
        multires=cfg.multires,
        multires_views=cfg.multires_views,
        tile=tile,
        interpret=interpret,
        compute_dtype=jnp.dtype(cfg.compute_dtype).type,
        **extra,
    )

    transposed = kind == "v2"
    kern_call = kern
    if transposed and mesh is not None and mesh.size > 1:
        kern_call = _shard_map_kernel(kern, mesh, n_point_args=2)

    def eval_level(branch, z_vals):
        s = z_vals.shape[1]
        ws = _weights_tuple(params, branch, cfg.netdepth)
        if transposed:
            # [3, N, S] point stream: S rides the lane axis, so nothing
            # in the chain pays the [N, 3]-pads-to-128-lanes tax.
            pts_T = (
                origins.T[:, :, None]
                + directions.T[:, :, None] * z_vals[None, :, :]
            )
            views_T = jnp.broadcast_to(
                viewdirs.T[:, :, None], (3, n, s)
            ).reshape(3, n * s)
            raw_T = kern_call(ws, pts_T.reshape(3, n * s), views_T)
            return raw_T.reshape(4, n, s)
        pts = (
            origins[..., None, :]
            + directions[..., None, :] * z_vals[..., :, None]
        )
        pts_flat = pts.reshape(n * s, 3)
        views_flat = jnp.broadcast_to(
            viewdirs[:, None, :], (n, s, 3)
        ).reshape(n * s, 3)
        raw = kern(ws, pts_flat, views_flat)
        return raw.reshape(n, s, 4)

    raw2out = rendering.raw2outputs_T if transposed else \
        rendering.raw2outputs

    t_rand = None
    if rng is not None and cfg.perturb > 0:
        t_rand = jax.random.uniform(
            keys["coarse_strat"], (n, cfg.N_samples)
        )
    z_vals = sampling.vanilla_z_vals(
        near, far, cfg.N_samples, cfg.lindisp, t_rand
    )
    raw = eval_level("coarse", z_vals)
    rgb, disp, acc, weights, depth = raw2out(
        raw, z_vals, directions, None, cfg.white_bkgd
    )

    out = {}
    if cfg.N_importance > 0:
        out.update(rgb0=rgb, disp0=disp, acc0=acc, depth0=depth)
        det_pdf = rng is None or not cfg.perturb
        use_k = (cfg.use_pdf_kernel and cfg.N_samples <= 128
                 and cfg.N_importance <= 128)
        if use_k:
            z_all, z_samples = pdf_merge.fine_z_vals(
                z_vals, weights, cfg.N_importance, rng=keys.get("pdf"),
                det=det_pdf, use_kernel=True,
                mesh=mesh if mesh is not None and mesh.size > 1 else None,
                return_samples=True,
            )
            out["z_std"] = jnp.std(z_samples, axis=-1)
        else:
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = sampling.sample_pdf(
                z_mid,
                weights[..., 1:-1],
                cfg.N_importance,
                rng=keys.get("pdf"),
                det=det_pdf,
            )
            z_samples = jax.lax.stop_gradient(z_samples)
            z_all = jnp.sort(
                jnp.concatenate([z_vals, z_samples], -1), -1
            )
            out["z_std"] = jnp.std(z_samples, axis=-1)
        raw = eval_level("fine", z_all)
        rgb, disp, acc, weights, depth = raw2out(
            raw, z_all, directions, None, cfg.white_bkgd
        )
    out.update(rgb=rgb, disp=disp, acc=acc, depth=depth)
    return out


def fused_mip_forward(params, rng, rays, cfg, resample_padding=0.01,
                      compute_extras=False, tile: int = 1024,
                      interpret: bool | None = None, mesh=None):
    """MipNeRF.__call__ semantics (models/mipnerf.py:41-131) with the MLP
    evaluated by the aligned fused kernel. With disable_normals=False the
    normals' density gradient is computed in-kernel
    (fused_mip.fused_mip_mlp_normals_T) — that path has no VJP rule, so
    it is render/eval-only (jax.grad through it fails loudly; the train
    step asserts disable_normals). mesh: see fused_vanilla_forward."""
    from consistentnerf_tpu.models.mlp import MipMLP
    from consistentnerf_tpu.ops import fused_mip

    with_normals = not cfg.disable_normals
    # The custom VJP returns zero cotangents for means/covs, valid only
    # while resampled t_vals are stop-gradient'ed (reference default).
    assert cfg.stop_level_grad, "fused mip step requires stop_level_grad"
    # The kernel's PE starts at frequency 2^0; a nonzero min_deg_point
    # would silently desynchronize it from the XLA MipMLP.
    assert cfg.min_deg_point == 0, "fused mip step requires min_deg_point=0"
    weights = [jnp.asarray(w) for w in
               fused_mip.flatten_mip_params(params, cfg.netdepth)]
    cd = jnp.dtype(cfg.compute_dtype).type
    # MipMLP knobs not exposed via the factory: source them from the
    # flax module defaults so the paths can't desynchronize.
    skip_layer, deg_view = MipMLP.skip_layer, MipMLP.deg_view
    rgb_padding, density_bias = MipMLP.rgb_padding, MipMLP.density_bias

    renderings = []
    t_vals = None
    weights_render = None
    n = rays.origins.shape[0]
    for i_level in range(cfg.mip_num_levels):
        if rng is None:
            key = None
        else:
            key, rng = jax.random.split(rng)
        if i_level == 0:
            t_vals, samples = sampling.sample_along_rays(
                key, rays.origins, rays.directions, rays.radii,
                cfg.mip_num_samples, rays.near, rays.far,
                cfg.genspace_fn, cfg.ray_shape, cfg.single_jitter,
                transposed=True,
            )
        else:
            t_vals, samples = sampling.resample_along_rays(
                key, rays.origins, rays.directions, rays.radii,
                t_vals, weights_render, cfg.ray_shape,
                cfg.stop_level_grad, resample_padding, cfg.single_jitter,
                transposed=True, use_kernel=cfg.use_pdf_kernel,
                mesh=mesh if mesh is not None and mesh.size > 1 else None,
            )
        means_T, covs_T = samples  # [3, N, S]
        if cfg.disable_integration:
            covs_T = jnp.zeros_like(covs_T)
        s = means_T.shape[-1]
        mip_kern = functools.partial(
            fused_mip.fused_mip_mlp_normals_T if with_normals
            else fused_mip.fused_mip_mlp_train_T,
            net_depth=cfg.netdepth, skip_layer=skip_layer,
            num_freqs=cfg.max_deg_point, deg_view=deg_view, tile=tile,
            interpret=interpret, compute_dtype=cd,
        )
        if mesh is not None and mesh.size > 1:
            mip_kern = _shard_map_kernel(mip_kern, mesh, n_point_args=3)
        raw_T = mip_kern(
            tuple(weights),
            means_T.reshape(3, n * s),
            covs_T.reshape(3, n * s),
            jnp.broadcast_to(
                rays.viewdirs.T[:, :, None], (3, n, s)
            ).reshape(3, n * s),
        )
        rgb_T = jax.nn.sigmoid(raw_T[:3])
        rgb_T = (rgb_T * (1 + 2 * rgb_padding) - rgb_padding).reshape(
            3, n, s
        )
        raw_density = raw_T[3]
        if (rng is not None) and (cfg.density_noise > 0):
            nkey, rng = jax.random.split(rng)
            raw_density = raw_density + cfg.density_noise * (
                jax.random.normal(nkey, raw_density.shape)
            )
        density = jax.nn.softplus(raw_density + density_bias).reshape(n, s)
        if with_normals:
            # -normalize(d density / d means), with the softplus factor
            # applied before normalization for exact parity with the XLA
            # chain (models/mlp.py:128-148; direction-wise the positive
            # sigmoid factor only matters at the eps floor).
            g = raw_T[4:7] * jax.nn.sigmoid(raw_density + density_bias)
            norm = jnp.sqrt(jnp.maximum(
                jnp.sum(g * g, axis=0, keepdims=True),
                jnp.finfo(jnp.float32).eps,
            ))
            normals = (-g / norm).reshape(3, n, s).transpose(1, 2, 0)
        else:
            normals = jnp.full((n, s, 3), jnp.nan)

        weights_render, _, _, delta = rendering.compute_alpha_weights(
            density, t_vals, rays.directions
        )
        renderings.append(
            rendering.volumetric_rendering(
                None, weights_render, normals, t_vals, cfg.white_bkgd,
                cfg.vis_num_rays, compute_extras, delta, rgbs_T=rgb_T,
            )
        )
    return renderings


def build_fused_mip_train_step(
    cfg,
    tx: Optional[optax.GradientTransformation] = None,
    donate: bool = True,
    tile: Optional[int] = None,
    mesh=None,
) -> Callable:
    """Fused-kernel counterpart of step.build_mip_train_step (identical
    schedules/losses, MLP evals through ops.fused_mip). mesh: see
    build_fused_vanilla_train_step."""
    tx = tx or make_optimizer(cfg)
    tile = tile or cfg.fused_tile
    # The normals forward (fused_mip_mlp_normals_T) has no VJP rule;
    # normals feed no reference loss, so training keeps them off.
    assert cfg.disable_normals, "fused mip TRAIN step requires disable_normals"

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
            renderings = fused_mip_forward(
                params, key if cfg.randomized else None, batch["rays"],
                cfg, resample_padding=resample_padding,
                compute_extras=(cfg.compute_disp_metrics
                                or cfg.compute_normal_metrics),
                tile=tile, mesh=mesh,
            )
            renderings_random = None
            if render_random:
                renderings_random = fused_mip_forward(
                    params, key2 if cfg.randomized else None,
                    batch["rays_random"], cfg,
                    resample_padding=resample_padding,
                    compute_extras=True, tile=tile, mesh=mesh,
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


def build_fused_vanilla_train_step(
    cfg,
    tx: Optional[optax.GradientTransformation] = None,
    donate: bool = True,
    tile: Optional[int] = None,
    lpips_params=None,
    mesh=None,
) -> Callable:
    """train_step(state, batch, rng) -> (state, stats), fused-kernel MLPs.

    mesh: pass the data-parallel Mesh so the Pallas kernel calls are
    shard_map-partitioned instead of replicated by the SPMD partitioner.
    """
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
                tile=tile, mesh=mesh,
            )
            if cfg.use_noise:
                outputs = step_lib.apply_output_noise(outputs, cfg,
                                                      step_rng)
            loss, stats = losses_lib.vanilla_losses(
                outputs, batch, cfg, cfg.far, temp, lpips_params
            )
            if cfg.ss_loss and "ref_image" in batch:
                def apply_fn(p, r, rays_):
                    return fused_vanilla_forward(p, r, rays_, cfg,
                                                 tile=tile, mesh=mesh)

                loss, stats = step_lib.apply_ss_loss(
                    apply_fn, params, step_rng, batch, cfg, outputs,
                    loss, stats,
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
