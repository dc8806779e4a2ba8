"""Trainable fused MLP: Pallas forward + Pallas backward with custom VJP.

STATUS: A/B BASELINE ONLY. This is the first-generation train kernel,
superseded in production by `ops.fused_mlp_v2` (the two-call fused step)
and `ops.fused_onepass` (the one-pass megakernel). It is kept as the
measured baseline for `tools/ab_bench.py` kernel-generation comparisons
(`fused_fp32`/`k_fused*` variants) and its tests pin the shared layout
contract; no production config routes through it
(Config.fused_kernel defaults to "v2"; only an explicit non-default
fused_kernel reaches this module via `ops.fused_train`).

XLA's backward pass for the NeRF MLP stores every 256-wide activation in
HBM during forward (~5+ GB round-trip per step at production batch sizes).
This op recomputes activations tile-by-tile *inside VMEM* during the
backward kernel instead: HBM traffic reduces to points, output gradients
and the weight set, and weight gradients accumulate in VMEM-resident
output blocks across the (sequential) grid.

Gradients are produced for weights/biases only — in the NeRF training
step the sample positions carry no trainable parameters (z_vals are
stratified or stop-gradient'ed, run_nerf_view.py:527), so input gradients
are defined as zero.

Layout contract matches `ops.fused_mlp.flatten_params`; the pure-jnp
`reference_mlp_apply` is the oracle for both passes.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from consistentnerf_tpu.ops import fused_mlp as fm

TRAIN_TILE = 256

# Raise XLA's 16 MiB default scoped-vmem cap (v5e has ~128 MiB physical):
# the backward keeps weights + fp32 grad accumulators resident and the
# forward wants large tiles.
_FWD_VMEM_LIMIT = 64 * 1024 * 1024
_BWD_VMEM_LIMIT = 100 * 1024 * 1024


def _forward_tile(pts, views, weights, *, net_depth, skips, multires,
                  multires_views, compute_dtype=jnp.float32):
    """Forward for one tile, returning output + all post-relu activations.

    weights: flat list as in flatten_params (viewdirs variant), with the
    kernels pre-cast to `compute_dtype` (biases fp32). All dot operands
    are single-dtype with fp32 MXU accumulation; activations are carried
    at the compute dtype so the VMEM footprint halves at bf16.
    Returns (out [T,4], x0, acts list[D], h7, hv_in, hv).
    """
    cd = compute_dtype
    x0 = fm._posenc(pts, multires).astype(cd)
    v0 = fm._posenc(views, multires_views).astype(cd)
    acts = []  # post-relu activation of each trunk layer (compute dtype)
    h = x0
    wi = 0
    layer_inputs = []
    for i in range(net_depth):
        layer_inputs.append(h)
        w, b = weights[wi], weights[wi + 1]
        wi += 2
        h = jnp.maximum(
            jnp.dot(h, w, preferred_element_type=jnp.float32) + b, 0.0
        ).astype(cd)
        acts.append(h)
        if i in skips:
            h = jnp.concatenate([x0, h], axis=-1)
    alpha_w, alpha_b = weights[wi], weights[wi + 1]
    feat_w, feat_b = weights[wi + 2], weights[wi + 3]
    v_w, v_b = weights[wi + 4], weights[wi + 5]
    rgb_w, rgb_b = weights[wi + 6], weights[wi + 7]
    h_last = h
    alpha = jnp.dot(h_last, alpha_w,
                    preferred_element_type=jnp.float32) + alpha_b
    feat = (
        jnp.dot(h_last, feat_w, preferred_element_type=jnp.float32) + feat_b
    ).astype(cd)
    hv_in = jnp.concatenate([feat, v0], axis=-1)
    hv = jnp.maximum(
        jnp.dot(hv_in, v_w, preferred_element_type=jnp.float32) + v_b, 0.0
    ).astype(cd)
    rgb = jnp.dot(hv, rgb_w, preferred_element_type=jnp.float32) + rgb_b
    out = jnp.concatenate([rgb, alpha], axis=-1)
    return out, x0, layer_inputs, acts, h_last, hv_in, hv


def _backward_tile(g, pts, views, weights, *, net_depth, skips, multires,
                   multires_views, compute_dtype=jnp.float32):
    """Recompute forward + compute all weight/bias grads for one tile.

    Upstream gradients are propagated in fp32 (relu masks applied there)
    and cast to the compute dtype only as dot operands, mirroring XLA's
    bf16 backward: bf16 multiplicands, fp32 accumulation everywhere.
    """
    cd = compute_dtype
    (out, x0, layer_inputs, acts, h_last, hv_in, hv) = _forward_tile(
        pts, views, weights, net_depth=net_depth, skips=skips,
        multires=multires, multires_views=multires_views,
        compute_dtype=cd,
    )
    P = x0.shape[-1]
    wi = 2 * net_depth
    alpha_w = weights[wi]
    feat_w = weights[wi + 2]
    v_w = weights[wi + 4]
    rgb_w = weights[wi + 6]

    grads = [None] * len(weights)

    def dot_t(a, b):
        # a [T, M] (compute dtype), b [T, N] fp32 upstream grad -> [M, N]
        return jax.lax.dot_general(
            a, b.astype(cd), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot_wt(gv, w):
        # gv [T, N] fp32, w [M, N] compute dtype -> gv @ w.T fp32
        return jnp.dot(gv.astype(cd), w.T,
                       preferred_element_type=jnp.float32)

    def relu_mask(act):
        # Mosaic has no bf16 vector compare on this target ("Target does
        # not support this comparison") — compare in fp32.
        return act.astype(jnp.float32) > 0

    g_rgb = g[:, :3]
    g_alpha = g[:, 3:4]

    # rgb head
    grads[wi + 6] = dot_t(hv, g_rgb)
    grads[wi + 7] = jnp.sum(g_rgb, axis=0, keepdims=True)
    # views layer
    g_hv = dot_wt(g_rgb, rgb_w) * relu_mask(hv)
    grads[wi + 4] = dot_t(hv_in, g_hv)
    grads[wi + 5] = jnp.sum(g_hv, axis=0, keepdims=True)
    g_hv_in = dot_wt(g_hv, v_w)
    g_feat = g_hv_in[:, : feat_w.shape[-1]]
    # feature + alpha heads (both take h_last)
    grads[wi + 2] = dot_t(h_last, g_feat)
    grads[wi + 3] = jnp.sum(g_feat, axis=0, keepdims=True)
    grads[wi] = dot_t(h_last, g_alpha)
    grads[wi + 1] = jnp.sum(g_alpha, axis=0, keepdims=True)

    g_h = dot_wt(g_feat, feat_w) + dot_wt(g_alpha, alpha_w)
    # trunk, backwards
    for i in reversed(range(net_depth)):
        if i in skips:
            # h after layer i was concat([x0, act_i]); drop the x0 part
            # (no input grads) and keep the activation part.
            g_act = g_h[:, P:]
        else:
            g_act = g_h
        g_pre = g_act * relu_mask(acts[i])
        grads[2 * i] = dot_t(layer_inputs[i], g_pre)
        grads[2 * i + 1] = jnp.sum(g_pre, axis=0, keepdims=True)
        if i > 0:
            g_h = dot_wt(g_pre, weights[2 * i])
    return grads


def _pad_rows(x, n):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9),
)
def fused_mlp_train(
    weights: Sequence[jnp.ndarray],
    pts: jnp.ndarray,
    views: jnp.ndarray,
    net_depth: int = 8,
    skips: tuple = (4,),
    multires: int = 10,
    multires_views: int = 4,
    tile: int = TRAIN_TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
):
    """Differentiable fused MLP. weights: flat tuple (flatten_params order,
    biases [1, C], fp32 — cast to compute_dtype internally so the weight
    cotangents stay fp32). Returns [N, 4]."""
    return _fwd_pallas(weights, pts, views, net_depth, skips, multires,
                       multires_views, tile, interpret, compute_dtype)


def _cast_ws(weights, compute_dtype):
    return tuple(fm.cast_weight_list(list(weights), compute_dtype))


def _fwd_pallas(weights, pts, views, net_depth, skips, multires,
                multires_views, tile, interpret, compute_dtype,
                out_lanes: int = 4):
    """out_lanes: lane width of the output buffer. 4 is the logical width
    (rgb+sigma) but forces a narrow, relayout-heavy VMEM->HBM write every
    grid step; 128 pads the write to a full register lane (sliced off
    outside) — measured much faster on v5e."""
    interpret = fm.auto_interpret(interpret)
    weights = _cast_ws(weights, compute_dtype)
    n = pts.shape[0]
    pts_p = _pad_rows(pts, -(-n // tile) * tile)
    views_p = _pad_rows(views, pts_p.shape[0])
    grid = (pts_p.shape[0] // tile,)

    def kernel(pts_ref, views_ref, *refs):
        *w_refs, out_ref = refs
        w_vals = [r[:] for r in w_refs]
        out, *_ = _forward_tile(
            pts_ref[:], views_ref[:], w_vals, net_depth=net_depth,
            skips=tuple(skips), multires=multires,
            multires_views=multires_views, compute_dtype=compute_dtype,
        )
        if out_lanes > 4:
            out = jnp.concatenate(
                [out, jnp.zeros((out.shape[0], out_lanes - 4), out.dtype)],
                axis=-1,
            )
        out_ref[:] = out

    def whole(w):
        return pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [whole(w) for w in weights],
        out_specs=pl.BlockSpec((tile, out_lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pts_p.shape[0], out_lanes),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(pts_p, views_p, *weights)
    return out[:n, :4]


def _bwd_pallas(weights, pts, views, g, net_depth, skips, multires,
                multires_views, tile, interpret, compute_dtype):
    interpret = fm.auto_interpret(interpret)
    weights = _cast_ws(weights, compute_dtype)
    n = pts.shape[0]
    n_pad = -(-n // tile) * tile
    pts_p = _pad_rows(pts, n_pad)
    views_p = _pad_rows(views, n_pad)
    g_p = _pad_rows(g, n_pad)  # zero-padded grads: padded rows contribute 0
    grid = (n_pad // tile,)

    def kernel(pts_ref, views_ref, g_ref, *refs):
        w_refs = refs[: len(weights)]
        out_refs = refs[len(weights): 2 * len(weights)]
        acc_refs = refs[2 * len(weights):]
        w_vals = [r[:] for r in w_refs]
        tile_grads = _backward_tile(
            g_ref[:], pts_ref[:], views_ref[:], w_vals,
            net_depth=net_depth, skips=tuple(skips), multires=multires,
            multires_views=multires_views, compute_dtype=compute_dtype,
        )
        # Accumulate into VMEM scratch (persists across the sequential
        # grid); outputs are written once on the last step, so Mosaic
        # doesn't have to keep the output blocks coherent per step.
        is_first = pl.program_id(0) == 0
        is_last = pl.program_id(0) == pl.num_programs(0) - 1
        for a_ref, o_ref, tg in zip(acc_refs, out_refs, tile_grads):

            @pl.when(is_first)
            def _(a_ref=a_ref, tg=tg):
                a_ref[:] = tg

            @pl.when(jnp.logical_not(is_first))
            def _(a_ref=a_ref, tg=tg):
                a_ref[:] = a_ref[:] + tg

            @pl.when(is_last)
            def _(a_ref=a_ref, o_ref=o_ref):
                o_ref[:] = a_ref[:]

    def whole(w):
        return pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    grads = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [whole(w) for w in weights],
        out_specs=tuple(whole(w) for w in weights),
        out_shape=tuple(
            jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights
        ),
        scratch_shapes=[
            pltpu.VMEM(w.shape, jnp.float32) for w in weights
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(pts_p, views_p, g_p, *weights)
    return list(grads)


def _vjp_fwd(weights, pts, views, net_depth, skips, multires,
             multires_views, tile, interpret, compute_dtype):
    out = _fwd_pallas(weights, pts, views, net_depth, skips, multires,
                      multires_views, tile, interpret, compute_dtype)
    return out, (weights, pts, views)


def _vjp_bwd(net_depth, skips, multires, multires_views, tile, interpret,
             compute_dtype, residuals, g):
    weights, pts, views = residuals
    d_weights = _bwd_pallas(
        weights, pts, views, g, net_depth, skips, multires, multires_views,
        tile, interpret, compute_dtype,
    )
    return (
        tuple(d_weights),
        jnp.zeros_like(pts),
        jnp.zeros_like(views),
    )


fused_mlp_train.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9),
)
def hybrid_mlp_train(
    weights: Sequence[jnp.ndarray],
    pts: jnp.ndarray,
    views: jnp.ndarray,
    net_depth: int = 8,
    skips: tuple = (4,),
    multires: int = 10,
    multires_views: int = 4,
    tile: int = TRAIN_TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
):
    """XLA forward + Pallas backward.

    Measured on v5e: XLA's forward (one huge-M matmul per layer) runs at
    near-peak MXU rate, while its backward pays ~10x the forward in HBM
    activation traffic; the Pallas backward recomputes activations in
    VMEM instead. This hybrid keeps the best half of each. Semantics
    identical to `fused_mlp_train` (weight grads only; positions carry no
    grad in the NeRF step).
    """
    return _fwd_xla(weights, pts, views, net_depth, skips, multires,
                    multires_views, compute_dtype)


def _fwd_xla(weights, pts, views, net_depth, skips, multires,
             multires_views, compute_dtype):
    flat = [w[0] if (w.ndim == 2 and w.shape[0] == 1) else w
            for w in fm.cast_weight_list(list(weights), compute_dtype)]
    return fm._mlp_body(
        pts, views, flat, net_depth=net_depth, skips=tuple(skips),
        multires=multires, multires_views=multires_views,
        use_viewdirs=True, compute_dtype=compute_dtype,
    )


def _hybrid_vjp_fwd(weights, pts, views, net_depth, skips, multires,
                    multires_views, tile, interpret, compute_dtype):
    out = _fwd_xla(weights, pts, views, net_depth, skips, multires,
                   multires_views, compute_dtype)
    return out, (weights, pts, views)


def _hybrid_vjp_bwd(net_depth, skips, multires, multires_views, tile,
                    interpret, compute_dtype, residuals, g):
    weights, pts, views = residuals
    d_weights = _bwd_pallas(
        weights, pts, views, g, net_depth, skips, multires, multires_views,
        tile, interpret, compute_dtype,
    )
    return (
        tuple(d_weights),
        jnp.zeros_like(pts),
        jnp.zeros_like(views),
    )


hybrid_mlp_train.defvjp(_hybrid_vjp_fwd, _hybrid_vjp_bwd)
