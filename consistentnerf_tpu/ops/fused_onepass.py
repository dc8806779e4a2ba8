"""Single-pass train megakernel: MLP forward + volumetric compositing +
per-ray loss cotangents + MLP backward in ONE pallas call per level.

Why: the two-call design (ops.fused_mlp_v2) must RECOMPUTE the forward
inside the backward kernel because activations cannot persist across
pallas calls except through HBM (983k points x 8 layers of [.,256] bf16
~= 4.5 GB per step — not storable). One call that runs forward, derives
the loss cotangent for its own tile, and immediately walks backward
keeps the activations in VMEM for the life of the tile: the per-step
matmul volume drops from 4x forward-FLOPs (fwd + recompute + dW + dx) to
3x, and the raw [4, N] stream, the XLA compositing pass
(`core.rendering.raw2outputs_T`) and the loss glue disappear from the
HBM timeline entirely.

The loss cotangent is computable in-kernel only for PER-RAY terms whose
batch-global denominators do not depend on parameters (the hard-mask /
plain MSE family: `run_nerf_view.py:1645-1648,1737,1762-1771`): the
denominators are functions of the mask alone, so the train step bakes
them into per-ray coefficient rows. The patch terms (MiDaS / SSIM /
LPIPS, `run_nerf_view.py:1679-1728`) are patch-global; the first
n_patches*patch_size^2 rays therefore take the ordinary differentiable
two-call path and their weight grads are summed with the megakernel's.

Compositing inside the kernel follows `raw2outputs` semantics
(`run_nerf_view.py:392-438`) on a ray-major [rows, T] layout: each tile
is a whole number of rays, samples are lane-contiguous, and the
exclusive transmittance product / suffix sums are segmented Hillis-
Steele scans over the lane axis (log2(S) masked roll-multiply steps —
VPU noise next to the trunk matmuls).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from consistentnerf_tpu.ops import fused_mlp as fm
from consistentnerf_tpu.ops import fused_mlp_v2 as v2
from consistentnerf_tpu.ops import pdf_merge

_VMEM_LIMIT = 100 * 1024 * 1024


def _lane_pos(t, seg):
    """Lane index within its segment, [1, t] int32."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    return jax.lax.rem(lane, seg)


def _seg_excl_prod(v, seg):
    """Per-segment exclusive product along lanes: out_i = prod_{j<i} v_j.

    v: [1, T] with T a multiple of seg; segments are lane-contiguous.
    """
    t = v.shape[-1]
    pos = _lane_pos(t, seg)
    acc = v
    k = 1
    while k < seg:
        shifted = jnp.roll(acc, k, axis=-1)
        acc = acc * jnp.where(pos >= k, shifted, 1.0)
        k *= 2
    excl = jnp.roll(acc, 1, axis=-1)
    return jnp.where(pos >= 1, excl, 1.0)


def _seg_excl_sum(u, seg):
    """Per-segment exclusive prefix sum: out_i = sum_{j<i} u_j."""
    t = u.shape[-1]
    pos = _lane_pos(t, seg)
    acc = u
    k = 1
    while k < seg:
        shifted = jnp.roll(acc, k, axis=-1)
        acc = acc + jnp.where(pos >= k, shifted, 0.0)
        k *= 2
    excl = jnp.roll(acc, 1, axis=-1)
    return jnp.where(pos >= 1, excl, 0.0)


def _seg_rev_excl_sum(u, seg):
    """Per-segment exclusive suffix sum: out_i = sum_{j>i} u_j."""
    t = u.shape[-1]
    pos = _lane_pos(t, seg)
    acc = u
    k = 1
    while k < seg:
        shifted = jnp.roll(acc, -k, axis=-1)
        acc = acc + jnp.where(pos < seg - k, shifted, 0.0)
        k *= 2
    excl = jnp.roll(acc, -1, axis=-1)
    return jnp.where(pos < seg - 1, excl, 0.0)


def _seg_total(u, seg):
    """Per-segment total, broadcast to every lane of the segment."""
    t = u.shape[-1]
    pos = _lane_pos(t, seg)
    acc = u
    k = 1
    while k < seg:
        shifted = jnp.roll(acc, -k, axis=-1)
        acc = acc + jnp.where(pos < seg - k, shifted, 0.0)
        k *= 2
    # acc_i = sum_{j>=i}; the segment total lives at pos 0 — add back the
    # prefix sum_{j<i} via the exclusive-suffix complement:
    # total = suffix_incl(i) + prefix_excl(i).
    prefix = acc  # rename for clarity below
    # prefix_excl_i = total - suffix_incl_i, so instead compute directly:
    pos0 = jnp.where(pos == 0, prefix, 0.0)
    k = 1
    while k < seg:
        shifted = jnp.roll(pos0, k, axis=-1)
        pos0 = pos0 + jnp.where(pos >= k, shifted, 0.0)
        k *= 2
    return pos0


def _composite_fwd(raw, z, dn, seg, white_bkgd):
    """In-kernel raw2outputs (run_nerf_view.py:392-438) on [rows, T].

    raw: [4, T] fp32 MLP output; z: [1, T] per-point depth; dn: [1, T]
    per-ray ||direction|| broadcast per point. Returns (rgb_map [3, T]
    broadcast per segment, depth [1, T], acc [1, T], w [1, T], saved).
    """
    t = raw.shape[-1]
    pos = _lane_pos(t, seg)
    z_next = jnp.roll(z, -1, axis=-1)
    dists = jnp.where(pos == seg - 1, 1e10, z_next - z) * dn

    c = jax.nn.sigmoid(raw[:3])  # [3, T]
    sigma = raw[3:4]  # [1, T]
    alpha = 1.0 - jnp.exp(-jnp.maximum(sigma, 0.0) * dists)
    # NOT `1 - alpha + 1e-10`: inside a pallas kernel that add flushes to
    # exactly 0 when alpha == 1 (the last sample's 1e10 dist saturates),
    # and the backward's suffix/v then divides 0/0. maximum() is exact and
    # numerically identical for every non-degenerate alpha.
    v = jnp.maximum(1.0 - alpha, 1e-10)
    trans = _seg_excl_prod(v, seg)
    w = alpha * trans

    acc = _seg_total(w, seg)
    rgb_map = jnp.concatenate(
        [_seg_total(w * c[i: i + 1], seg) for i in range(3)], axis=0
    )
    depth = _seg_total(w * z, seg)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc)
    saved = dict(c=c, sigma=sigma, alpha=alpha, v=v, trans=trans, w=w,
                 dists=dists, z=z)
    return rgb_map, depth, acc, w, saved


def _composite_bwd(d_rgb, d_depth, saved, seg, white_bkgd):
    """VJP of _composite_fwd into the raw MLP output.

    d_rgb: [3, T] per-ray cotangent of rgb_map (broadcast per point);
    d_depth: [1, T] likewise. Returns d_raw [4, T].
    """
    c, sigma, alpha = saved["c"], saved["sigma"], saved["alpha"]
    v, trans, w = saved["v"], saved["trans"], saved["w"]
    dists, z = saved["dists"], saved["z"]

    d_acc = -jnp.sum(d_rgb, axis=0, keepdims=True) if white_bkgd else 0.0
    d_c = w * d_rgb
    d_w = jnp.sum(d_rgb * c, axis=0, keepdims=True) + d_depth * z + d_acc
    suffix = _seg_rev_excl_sum(d_w * w, seg)
    d_alpha = d_w * trans - suffix / v
    # d alpha / d sigma = (1 - alpha) * dists on sigma > 0 (relu).
    d_sigma = d_alpha * (1.0 - alpha) * dists * (sigma > 0)
    d_raw_rgb = d_c * c * (1.0 - c)
    return jnp.concatenate([d_raw_rgb, d_sigma], axis=0)


def _tile_cols(seg, requested):
    """Whole-ray tile width: a multiple of lcm(seg, 128), close to
    `requested` columns."""
    base = seg * 128 // np.gcd(seg, 128)
    return base * max(1, requested // base)


def onepass_level_T(
    weights: Sequence[jnp.ndarray],
    pts_T: jnp.ndarray,      # [3, N*S]
    views_T: jnp.ndarray,    # [3, N*S]
    z_row: jnp.ndarray,      # [1, N*S] per-point depth along the ray
    dn_row: jnp.ndarray,     # [1, N*S] ||direction|| per ray
    coeff_rgb: jnp.ndarray,  # [1, N*S] d loss / d rgb_map = coeff*(rgb-t)
    target_rows: jnp.ndarray,  # [3, N*S] rgb target per ray
    coeff_depth: jnp.ndarray,  # [1, N*S] d loss / d depth = coeff*(d-p)
    prior_row: jnp.ndarray,    # [1, N*S] depth prior per ray
    *,
    seg: int,
    net_depth: int = 8,
    skips: tuple = (4,),
    multires: int = 10,
    multires_views: int = 4,
    tile: int = 1024,
    white_bkgd: bool = False,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
):
    """One-pass fwd+composite+loss-cotangent+bwd for one level.

    Returns (out_rows [6, N*S] fp32, d_weights torch-layout list).
    out_rows: 0-2 rgb_map (per-segment broadcast), 3 depth, 4 acc,
    5 per-point compositing weight (for sample_pdf).
    """
    interpret = fm.auto_interpret(interpret)
    ops = v2.prepare_aligned(weights, net_depth, skips, multires,
                             multires_views, compute_dtype)
    n = pts_T.shape[1]
    assert n % seg == 0, (n, seg)
    tile_c = _tile_cols(seg, tile) if not interpret else seg
    n_pad = -(-n // tile_c) * tile_c
    rows_in = [pts_T, views_T, z_row, dn_row, coeff_rgb, target_rows,
               coeff_depth, prior_row]
    rows_in = [v2._pad_cols(r, n_pad) for r in rows_in]
    grid = (n_pad // tile_c,)
    trainable = list(range(2, len(ops)))

    def kernel(pts_ref, views_ref, z_ref, dn_ref, crgb_ref, tgt_ref,
               cd_ref, prior_ref, *refs):
        op_refs = refs[: len(ops)]
        out_ref = refs[len(ops)]
        grad_refs = refs[len(ops) + 1: len(ops) + 1 + len(trainable)]
        acc_refs = refs[len(ops) + 1 + len(trainable):]
        vals = [r[:] for r in op_refs]

        raw, res = v2._aligned_forward(
            pts_ref[:], views_ref[:], vals, net_depth=net_depth,
            skips=tuple(skips), compute_dtype=compute_dtype,
            transposed=True,
        )
        rgb_map, depth, acc, w, saved = _composite_fwd(
            raw, z_ref[:], dn_ref[:], seg, white_bkgd
        )
        out_ref[:] = jnp.concatenate([rgb_map, depth, acc, w], axis=0)

        d_rgb = crgb_ref[:] * (rgb_map - tgt_ref[:])
        d_depth = cd_ref[:] * (depth - prior_ref[:])
        d_raw = _composite_bwd(d_rgb, d_depth, saved, seg, white_bkgd)

        tile_grads = v2._aligned_backward_from_res(
            d_raw, res, vals, net_depth=net_depth, skips=tuple(skips),
            compute_dtype=compute_dtype, transposed=True,
        )
        is_first = pl.program_id(0) == 0
        is_last = pl.program_id(0) == pl.num_programs(0) - 1
        for slot, (a_ref, g_ref) in enumerate(zip(acc_refs, grad_refs)):
            tg = tile_grads[trainable[slot]]

            @pl.when(is_first)
            def _(a_ref=a_ref, tg=tg):
                a_ref[:] = tg

            @pl.when(jnp.logical_not(is_first))
            def _(a_ref=a_ref, tg=tg):
                a_ref[:] = a_ref[:] + tg

            @pl.when(is_last)
            def _(a_ref=a_ref, g_ref=g_ref):
                g_ref[:] = a_ref[:]

    row_spec3 = pl.BlockSpec((3, tile_c), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    row_spec1 = pl.BlockSpec((1, tile_c), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec3, row_spec3, row_spec1, row_spec1, row_spec1,
                  row_spec3, row_spec1, row_spec1]
        + [v2._whole(wv) for wv in ops],
        out_specs=(
            pl.BlockSpec((6, tile_c), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ) + tuple(v2._whole(ops[t]) for t in trainable),
        out_shape=(
            jax.ShapeDtypeStruct((6, n_pad), jnp.float32),
        ) + tuple(
            jax.ShapeDtypeStruct(ops[t].shape, jnp.float32)
            for t in trainable
        ),
        scratch_shapes=[
            pltpu.VMEM(ops[t].shape, jnp.float32) for t in trainable
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*rows_in, *ops)

    out_rows = outs[0][:, :n]
    aligned_grads = [None, None] + list(outs[1:])
    d_weights = v2._recombine_grads(aligned_grads, weights, net_depth,
                                    skips, multires, multires_views)
    return out_rows, d_weights


def _mip_composite_fwd(raw, tmid, delta, tlo, thi, seg, white_bkgd,
                       rgb_padding, density_bias, noise=None):
    """In-kernel mip compositing (core.rendering.compute_alpha_weights +
    volumetric_rendering's rgb/distance_mean, mip.py:195-294 semantics)
    on [rows, T]: raw [4, T] MLP heads, tmid/delta per-point rows,
    tlo/thi per-ray clip bounds. Includes the head activations
    (sigmoid+rgb_padding, softplus density); `noise` is the per-point
    density-regularization noise row (MLP.density_noise — additive on
    the raw density logit, so the backward chain is unchanged)."""
    s_rgb = jax.nn.sigmoid(raw[:3])
    c = s_rgb * (1.0 + 2.0 * rgb_padding) - rgb_padding
    x_d = raw[3:4] + density_bias
    if noise is not None:
        x_d = x_d + noise
    density = jax.nn.softplus(x_d)
    sigd = jax.nn.sigmoid(x_d)
    dd = density * delta
    alpha = 1.0 - jnp.exp(-dd)
    trans = jnp.exp(-_seg_excl_sum(dd, seg))
    w = alpha * trans

    acc = _seg_total(w, seg)
    rgb_map = jnp.concatenate(
        [_seg_total(w * c[i: i + 1], seg) for i in range(3)], axis=0
    )
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc)
    swt = _seg_total(w * tmid, seg)
    acc_s = jnp.maximum(acc, 1e-37)
    valid = acc > 0
    # acc == 0 -> 0/0 nan -> nan_to_num(inf) -> clipped to thi in the
    # XLA chain (rendering.volumetric_rendering:166-170); branch-free
    # equivalent here.
    dist_u = jnp.where(valid, swt / acc_s, thi)
    dist = jnp.clip(dist_u, tlo, thi)
    saved = dict(s_rgb=s_rgb, c=c, sigd=sigd, alpha=alpha, trans=trans,
                 w=w, delta=delta, tmid=tmid, acc_s=acc_s,
                 dist_u=dist_u, valid=valid, tlo=tlo, thi=thi)
    return rgb_map, dist, acc, w, saved


def _mip_composite_bwd(d_rgb, d_dist, saved, seg, white_bkgd, rgb_padding):
    """VJP of _mip_composite_fwd into the raw MLP heads.

    d_rgb: [3, T] per-ray rgb_map cotangent (broadcast per point);
    d_dist: [1, T] distance_mean cotangent. Returns d_raw [4, T].
    """
    c, w, trans, alpha = (saved["c"], saved["w"], saved["trans"],
                          saved["alpha"])
    d_acc = -jnp.sum(d_rgb, axis=0, keepdims=True) if white_bkgd else 0.0
    in_rng = ((saved["dist_u"] > saved["tlo"])
              & (saved["dist_u"] < saved["thi"])
              & saved["valid"])
    d_su = jnp.where(in_rng, d_dist, 0.0)
    d_w = (jnp.sum(d_rgb * c, axis=0, keepdims=True)
           + d_su * (saved["tmid"] - saved["dist_u"]) / saved["acc_s"]
           + d_acc)
    # w_i = alpha_i * trans_i with trans_i = exp(-sum_{j<i} dd_j):
    # d/d dd_i = d_w_i trans_i e^{-dd_i} - sum_{j>i} d_w_j w_j.
    d_dd = (d_w * trans * (1.0 - alpha)
            - _seg_rev_excl_sum(d_w * w, seg))
    d_raw_d = d_dd * saved["delta"] * saved["sigd"]
    d_raw_rgb = (w * d_rgb * (1.0 + 2.0 * rgb_padding)
                 * saved["s_rgb"] * (1.0 - saved["s_rgb"]))
    return jnp.concatenate([d_raw_rgb, d_raw_d], axis=0)


def onepass_mip_level_T(
    weights: Sequence[jnp.ndarray],
    means_T: jnp.ndarray,    # [3, N*S]
    covs_T: jnp.ndarray,     # [3, N*S] diagonal covariances
    views_T: jnp.ndarray,    # [3, N*S]
    tmid_row: jnp.ndarray,   # [1, N*S] fencepost midpoints
    delta_row: jnp.ndarray,  # [1, N*S] (t1-t0)*||d||
    tlo_row: jnp.ndarray,    # [1, N*S] per-ray t_vals[0] (clip lo)
    thi_row: jnp.ndarray,    # [1, N*S] per-ray t_vals[-1] (clip hi)
    coeff_rgb: jnp.ndarray,  # [1, N*S] d loss/d rgb = coeff*(rgb-t)
    target_rows: jnp.ndarray,  # [3, N*S]
    coeff_depth: jnp.ndarray,  # [1, N*S] d loss/d dist = coeff*(d-p)
    prior_row: jnp.ndarray,    # [1, N*S]
    noise_row=None,            # [1, N*S] density noise (None = off)
    *,
    seg: int,
    net_depth: int = 8,
    skip_layer: int = 4,
    num_freqs: int = 16,
    deg_view: int = 4,
    tile: int = 1024,
    white_bkgd: bool = False,
    rgb_padding: float = 0.001,
    density_bias: float = -1.0,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
):
    """One-pass fwd+composite+loss-cotangent+bwd for one mip level.

    Returns (out_rows [6, N*S] fp32, d_weights flax-layout list).
    out_rows: 0-2 rgb (per-segment broadcast), 3 distance_mean, 4 acc,
    5 per-point alpha-weight (for resample_along_rays).
    """
    from consistentnerf_tpu.ops import fused_mip as fmip

    interpret = fm.auto_interpret(interpret)
    ops = fmip.prepare_mip_aligned(weights, net_depth, skip_layer,
                                   num_freqs, deg_view, compute_dtype)
    n = means_T.shape[1]
    assert n % seg == 0, (n, seg)
    tile_c = _tile_cols(seg, tile) if not interpret else seg
    n_pad = -(-n // tile_c) * tile_c
    if noise_row is None:
        noise_row = jnp.zeros_like(tmid_row)
    rows_in = [means_T, covs_T, views_T, tmid_row, delta_row, tlo_row,
               thi_row, coeff_rgb, target_rows, coeff_depth, prior_row,
               noise_row]
    rows_in = [v2._pad_cols(r, n_pad) for r in rows_in]
    grid = (n_pad // tile_c,)
    trainable = list(range(3, len(ops)))

    def kernel(m_ref, c_ref, v_ref, tm_ref, dl_ref, lo_ref, hi_ref,
               crgb_ref, tgt_ref, cd_ref, pr_ref, nz_ref, *refs):
        op_refs = refs[: len(ops)]
        out_ref = refs[len(ops)]
        grad_refs = refs[len(ops) + 1: len(ops) + 1 + len(trainable)]
        acc_refs = refs[len(ops) + 1 + len(trainable):]
        vals = [r[:] for r in op_refs]

        raw, res = fmip._mip_aligned_forward(
            m_ref[:], c_ref[:], v_ref[:], vals, net_depth=net_depth,
            skip_layer=skip_layer, compute_dtype=compute_dtype,
            transposed=True,
        )
        rgb_map, dist, acc, w, saved = _mip_composite_fwd(
            raw, tm_ref[:], dl_ref[:], lo_ref[:], hi_ref[:], seg,
            white_bkgd, rgb_padding, density_bias, noise=nz_ref[:],
        )
        out_ref[:] = jnp.concatenate([rgb_map, dist, acc, w], axis=0)

        d_rgb = crgb_ref[:] * (rgb_map - tgt_ref[:])
        d_dist = cd_ref[:] * (dist - pr_ref[:])
        d_raw = _mip_composite_bwd(d_rgb, d_dist, saved, seg,
                                   white_bkgd, rgb_padding)
        tile_grads = fmip._mip_aligned_backward_from_res(
            d_raw, res, vals, net_depth=net_depth,
            skip_layer=skip_layer, compute_dtype=compute_dtype,
            transposed=True,
        )
        is_first = pl.program_id(0) == 0
        is_last = pl.program_id(0) == pl.num_programs(0) - 1
        for slot, (a_ref, g_ref) in enumerate(zip(acc_refs, grad_refs)):
            tg = tile_grads[trainable[slot]]

            @pl.when(is_first)
            def _(a_ref=a_ref, tg=tg):
                a_ref[:] = tg

            @pl.when(jnp.logical_not(is_first))
            def _(a_ref=a_ref, tg=tg):
                a_ref[:] = a_ref[:] + tg

            @pl.when(is_last)
            def _(a_ref=a_ref, g_ref=g_ref):
                g_ref[:] = a_ref[:]

    row_spec3 = pl.BlockSpec((3, tile_c), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    row_spec1 = pl.BlockSpec((1, tile_c), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec3, row_spec3, row_spec3, row_spec1, row_spec1,
                  row_spec1, row_spec1, row_spec1, row_spec3, row_spec1,
                  row_spec1, row_spec1]
        + [fmip._whole(wv) for wv in ops],
        out_specs=(
            pl.BlockSpec((6, tile_c), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ) + tuple(fmip._whole(ops[t]) for t in trainable),
        out_shape=(
            jax.ShapeDtypeStruct((6, n_pad), jnp.float32),
        ) + tuple(
            jax.ShapeDtypeStruct(ops[t].shape, jnp.float32)
            for t in trainable
        ),
        scratch_shapes=[
            pltpu.VMEM(ops[t].shape, jnp.float32) for t in trainable
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*rows_in, *ops)

    out_rows = outs[0][:, :n]
    aligned_grads = [None, None, None] + list(outs[1:])
    d_weights = fmip._recombine_mip_grads(aligned_grads, weights,
                                          net_depth, skip_layer,
                                          num_freqs, deg_view)
    return out_rows, d_weights


def render_level_T(
    weights: Sequence[jnp.ndarray],
    pts_T: jnp.ndarray,    # [3, N*S]
    views_T: jnp.ndarray,  # [3, N*S]
    z_row: jnp.ndarray,    # [1, N*S] per-point depth along the ray
    dn_row: jnp.ndarray,   # [1, N*S] ||direction|| per ray
    *,
    seg: int,
    net_depth: int = 8,
    skips: tuple = (4,),
    multires: int = 10,
    multires_views: int = 4,
    tile: int = 1024,
    white_bkgd: bool = False,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
):
    """Forward-only megakernel: MLP forward + in-kernel compositing.

    The deterministic render path (`run_nerf_view.py:140-180` test-time
    chain) spends its HBM budget writing the raw [4, N*S] MLP output and
    re-reading it in the XLA compositing pass; compositing inside the
    kernel reduces the per-level output to six per-ray rows. Returns
    out_rows [6, N*S] fp32: 0-2 rgb_map (per-segment broadcast),
    3 depth, 4 acc, 5 per-point compositing weight (for sample_pdf).
    """
    interpret = fm.auto_interpret(interpret)
    ops = v2.prepare_aligned(weights, net_depth, skips, multires,
                             multires_views, compute_dtype)
    n = pts_T.shape[1]
    assert n % seg == 0, (n, seg)
    tile_c = _tile_cols(seg, tile) if not interpret else seg
    n_pad = -(-n // tile_c) * tile_c
    rows_in = [v2._pad_cols(r, n_pad)
               for r in (pts_T, views_T, z_row, dn_row)]
    grid = (n_pad // tile_c,)

    def kernel(pts_ref, views_ref, z_ref, dn_ref, *refs):
        op_refs = refs[: len(ops)]
        out_ref = refs[len(ops)]
        vals = [r[:] for r in op_refs]
        raw, _ = v2._aligned_forward(
            pts_ref[:], views_ref[:], vals, net_depth=net_depth,
            skips=tuple(skips), compute_dtype=compute_dtype,
            transposed=True,
        )
        rgb_map, depth, acc, w, _ = _composite_fwd(
            raw, z_ref[:], dn_ref[:], seg, white_bkgd
        )
        out_ref[:] = jnp.concatenate([rgb_map, depth, acc, w], axis=0)

    row_spec3 = pl.BlockSpec((3, tile_c), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    row_spec1 = pl.BlockSpec((1, tile_c), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec3, row_spec3, row_spec1, row_spec1]
        + [v2._whole(wv) for wv in ops],
        out_specs=pl.BlockSpec((6, tile_c), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*rows_in, *ops)
    return out[:, :n]


# ---------------------------------------------------------------------------
# Train step built on the megakernel
# ---------------------------------------------------------------------------


def onepass_supported(cfg) -> bool:
    """Whether the one-pass megakernel step computes cfg's exact loss.

    Requires per-ray loss terms with parameter-independent denominators
    (hardmask / softmask-as-hardmask / plain MSE families). Output noise
    folds into the cotangent rows as a target shift; the ss_loss
    online-reprojection term is supported too (its consistency weight is
    a pure function of batch data, so the gating swaps coefficient rows
    and the reference-ray renders run in their own megakernel pair).

    softLpmask (img2mse_softLpmask, run_nerf_view.py:58) is excluded BY
    ANALYSIS, not omission: its rgb and depth terms carry two DISTINCT
    prediction-dependent stop-gradient denominators (sum of |residual|^p
    weights). Each denominator is value-only (no gradient path), so a
    single such term could run unscaled in-kernel with dW post-scaled by
    1/D (gradients are linear in the cotangents) — but a level's bwd
    accumulates the rgb and depth cotangents into ONE dW, and
    dW = A/D_rgb + B/D_d cannot be recovered from a single joint
    accumulation. Every exact alternative (forward pre-pass to obtain
    the denominators, two-pass grid with residual stash, dual dW
    scratch) costs >= 4x fwd-FLOPs or ~2x VMEM — exactly the two-call
    fused fallback's budget, so for this ablation family the fallback IS
    the optimal restructure; its measured cost is recorded in
    RUNS_r4.md (tools/ab_bench.py softlp_fused vs onepass).
    """
    return (
        cfg.backbone == "vanilla"
        and cfg.use_viewdirs
        and cfg.N_importance > 0
        and not cfg.softLpmask
        and 3 * cfg.multires <= 60
        and 3 * cfg.multires_views <= 60
    )


def _grad_branch_dict(d_list, params_branch, net_depth):
    """torch-layout flat grad list -> one NeRFMLP branch's grad dict
    (zeros for non-Dense leaves such as the temperature scalars)."""
    out = {
        k: jax.tree_util.tree_map(jnp.zeros_like, leaf)
        for k, leaf in params_branch.items()
    }
    i = 0
    names = [f"pts_{l}" for l in range(net_depth)]
    names += ["alpha", "feature", "views_0", "rgb"]
    for name in names:
        out[name] = {
            "kernel": d_list[i],
            "bias": d_list[i + 1].reshape(
                params_branch[name]["bias"].shape
            ),
        }
        i += 2
    return out


def _rep_row(per_ray, seg):
    """[N] or [N, C] per-ray values -> [C, N*seg] per-point rows."""
    x = per_ray if per_ray.ndim == 2 else per_ray[:, None]
    n, c = x.shape
    return jnp.broadcast_to(x.T[:, :, None], (c, n, seg)).reshape(
        c, n * seg
    )


def _shard_onepass(call, mesh):
    """shard_map the megakernel over the mesh data axis: weights
    replicated, point/row streams split on dim 1, dW psum'ed."""
    from jax.sharding import PartitionSpec as P

    data = P(None, "data")

    def inner(ws, *rows):
        out_rows, d_ws = call(ws, *rows)
        d_ws = [jax.lax.psum(g, "data") for g in d_ws]
        return out_rows, tuple(d_ws)

    n_grads = None  # resolved lazily by shard_map's pytree handling

    def wrapped(ws, *rows):
        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(),) + (data,) * len(rows),
            out_specs=(data, P()),
            check_vma=False,
        )(ws, *rows)

    return wrapped


def build_onepass_vanilla_train_step(
    cfg,
    tx=None,
    donate: bool = True,
    tile=None,
    lpips_params=None,
    mesh=None,
):
    """train_step(state, batch, rng) -> (state, stats); the vanilla
    ConsistentNeRF loss with both MLP levels running the one-pass
    megakernel on non-patch rays and the ordinary differentiable fused
    path on the patch rays (whose SSIM/LPIPS/MiDaS terms are
    patch-global). Loss semantics identical to
    `train.losses.vanilla_losses` (run_nerf_view.py:1645-1906); the
    stats are literally computed by it on the assembled outputs."""
    import optax

    from consistentnerf_tpu.core import rendering, sampling
    from consistentnerf_tpu.ops.fused_train import _weights_tuple
    from consistentnerf_tpu.train import losses as losses_lib
    from consistentnerf_tpu.train import step as step_lib
    from consistentnerf_tpu.train.state import TrainState, make_optimizer

    assert onepass_supported(cfg), (
        "one-pass fused step requires per-ray losses with parameter-"
        "independent denominators (hardmask/plain families; soft masks "
        "are prediction-weighted); use build_fused_vanilla_train_step"
    )
    tx = tx or make_optimizer(cfg)
    tile = tile or cfg.fused_tile
    net_depth = cfg.netdepth
    s_c = cfg.N_samples
    s_f = cfg.N_samples + cfg.N_importance
    assert cfg.N_importance > 0, "one-pass step assumes a fine level"
    has_patches = (not cfg.use_batching) and cfg.n_patches > 0
    n_patch_rays = cfg.n_patches * cfg.patch_size**2 if has_patches else 0

    level_kw = dict(
        net_depth=net_depth, skips=(4,), multires=cfg.multires,
        multires_views=cfg.multires_views, tile=tile,
        white_bkgd=cfg.white_bkgd,
        compute_dtype=jnp.dtype(cfg.compute_dtype).type,
    )
    sharded = mesh is not None and mesh.size > 1

    def mega_level(ws, seg, pts_T, views_T, rows):
        call = functools.partial(
            lambda w, *r: onepass_level_T(w, *r, seg=seg, **level_kw)
        )
        if sharded:
            call = _shard_onepass(call, mesh)
        out_rows, d_ws = call(ws, pts_T, views_T, *rows)
        return out_rows, list(d_ws)

    def kern_patch(ws, pts_T, views_T):
        """Differentiable fused MLP for the patch path."""
        return v2.fused_mlp_v2_train_T(
            ws, pts_T, views_T, net_depth, (4,), cfg.multires,
            cfg.multires_views, tile, None,
            jnp.dtype(cfg.compute_dtype).type,
        )

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        rays = step_lib.rays_from_batch(batch, cfg.near, cfg.far)
        n = rays.origins.shape[0]
        p = n_patch_rays
        far = cfg.far
        ls = batch.get("loss_scale", jnp.array(1.0))
        mask = batch["mask"]
        target = batch["rgb"]
        prior = batch["depth"]
        ones = jnp.ones((n,), jnp.float32)

        # --- per-ray loss-cotangent coefficients (global denominators,
        # parameter-independent; see module docstring) ---
        if cfg.hardmask or cfg.softmask:
            m_sum = jnp.sum(mask)
            coeff_rgb = ls * 2.0 * (
                mask / jnp.maximum(3.0 * m_sum, 1.0)
                + jnp.where(m_sum == n, 0.0, cfg.hardmask_coef)
                * (1.0 - mask) / jnp.maximum(3.0 * (n - m_sum), 1.0)
            )
        else:
            coeff_rgb = ls * 2.0 / (3.0 * n) * ones
        if cfg.with_depth_loss:
            if cfg.hardmask or cfg.softmask:
                coeff_d = ls * 2.0 * mask / (
                    far**2 * jnp.maximum(jnp.sum(mask), 1.0)
                )
                prior_eff = prior
            elif cfg.with_depth_norm:
                prior_eff = jnp.where(mask > 0, prior, 0.0)
                coeff_d = ls * 2.0 / (far**2 * n) * ones
            else:
                prior_eff = jnp.where(mask > 0, prior, 0.0)
                coeff_d = ls * 2.0 / float(n) * ones
        else:
            coeff_d = jnp.zeros((n,), jnp.float32)
            prior_eff = jnp.zeros((n,), jnp.float32)

        # Output noise (run_nerf_view.py:1633-1638 via
        # step_lib.apply_output_noise): the per-ray MSE cotangent
        # coeff*(rgb + n - t) is coeff*(rgb - (t - n)), so the noise
        # folds into the kernel's target/prior rows as a shift — same
        # draw stream as the XLA step (fold_in(step_rng, 7)); the stats
        # path re-applies apply_output_noise to the assembled outputs.
        if cfg.use_noise:
            std = jnp.asarray(0.05)
            nk = jax.random.split(jax.random.fold_in(step_rng, 7), 4)
            n_rgb = std * jax.random.normal(nk[0], (n, 3))
            n_d = cfg.far * std * jax.random.normal(nk[1], (n,))
            n_rgb0 = std * jax.random.normal(nk[2], (n, 3))
            n_d0 = cfg.far * std * jax.random.normal(nk[3], (n,))
            tgt_f, pri_f = target - n_rgb, prior_eff - n_d
            tgt_c, pri_c = target - n_rgb0, prior_eff - n_d0
        else:
            n_rgb = n_d = n_rgb0 = n_d0 = None
            tgt_f = tgt_c = target
            pri_f = pri_c = prior_eff

        # Online-reprojection term (ss_loss, run_nerf_view_test.py:944-
        # 967 via step_lib.apply_ss_loss): the reprojection weight is a
        # pure function of batch data (consistency/online.build_ref_rays
        # — no parameters), so BOTH pieces fit the megakernel: the
        # stochastic gating swaps the fine-level rgb coefficient rows,
        # and the reference-ray renders get their own megakernel pair
        # with masked-mse coefficient rows. Stats re-assemble through
        # apply_ss_loss itself (same rng folds).
        has_ss = cfg.ss_loss and "ref_image" in batch
        coeff_rgb_f = coeff_rgb_c = coeff_rgb
        if has_ss:
            from consistentnerf_tpu.consistency import online

            ss_rng, gate_rng = jax.random.split(
                jax.random.fold_in(step_rng, 1)
            )
            points_w = (
                batch["origins"]
                + batch["depth"][..., None] * batch["directions"]
            )
            ref = online.build_ref_rays(
                points_w, batch["ref_pose"], batch["ref_image"],
                batch["ref_depth"], batch["K"], cfg.occlusion_threshold,
                use_occlusion=True,
            )
            w_ss = ref["weight"]
            use_gated = jax.random.bernoulli(gate_rng)
            s1 = jnp.sum(w_ss)
            gated_coeff = jnp.where(
                3.0 * s1 > 0, 2.0 * w_ss / jnp.maximum(3.0 * s1, 1.0), 0.0
            )
            coeff_rgb_f = jnp.where(use_gated, ls * gated_coeff,
                                    coeff_rgb)

        # --- shared stratified draws (one [N, S] draw, sliced per path,
        # so patch/rest rays see independent jitter) ---
        keys = jax.random.split(step_rng, 3)
        t_rand = (
            jax.random.uniform(keys[0], (n, s_c))
            if cfg.perturb > 0 else None
        )
        det_pdf = not cfg.perturb
        z_c = sampling.vanilla_z_vals(
            rays.near, rays.far, s_c, cfg.lindisp, t_rand
        )  # [N, S_c]
        dnorm = jnp.linalg.norm(rays.directions, axis=-1)

        o_T = rays.origins.T
        d_T = rays.directions.T
        v_T = rays.viewdirs.T

        def pts_views_of(oT, dT, vT, z_sub):
            n_sub, seg = z_sub.shape
            pts = (
                oT[:, :, None] + dT[:, :, None] * z_sub[None]
            ).reshape(3, n_sub * seg)
            views = jnp.broadcast_to(
                vT[:, :, None], (3, n_sub, seg)
            ).reshape(3, n_sub * seg)
            return pts, views

        def pts_views(sl, z_sub):
            return pts_views_of(o_T[:, sl], d_T[:, sl], v_T[:, sl], z_sub)

        def rows_of(z_sub, dn, cr, tg, cd, pr):
            seg = z_sub.shape[1]
            return (
                z_sub.reshape(1, -1),
                _rep_row(dn, seg),
                _rep_row(cr, seg),
                _rep_row(tg, seg),
                _rep_row(cd, seg),
                _rep_row(pr, seg),
            )

        def level_rows(sl, z_sub, coeff, tgt, pri):
            return rows_of(z_sub, dnorm[sl], coeff[sl], tgt[sl],
                           coeff_d[sl], pri[sl])

        # ---------------- mega path: rays [p:] ----------------
        sl_r = slice(p, n)
        params = state.params
        ws_c = _weights_tuple(params, "coarse", net_depth)
        ws_f = _weights_tuple(params, "fine", net_depth)

        pts_c, views_c = pts_views(sl_r, z_c[p:])
        out_c, dw_c = mega_level(
            ws_c, s_c, pts_c, views_c,
            level_rows(sl_r, z_c[p:], coeff_rgb_c, tgt_c, pri_c),
        )
        w_rest = out_c[5].reshape(n - p, s_c)
        z_f_r = pdf_merge.fine_z_vals(
            z_c[p:], w_rest, cfg.N_importance,
            rng=None if det_pdf else jax.random.fold_in(keys[1], 0),
            det=det_pdf, use_kernel=cfg.use_pdf_kernel,
            mesh=mesh if sharded else None,
        )  # [N-p, S_f]
        pts_f, views_f = pts_views(sl_r, z_f_r)
        out_f, dw_f = mega_level(
            ws_f, s_f, pts_f, views_f,
            level_rows(sl_r, z_f_r, coeff_rgb_f, tgt_f, pri_f),
        )

        def rows_to_maps(out_rows, n_sub, seg):
            per_ray = out_rows[:, ::seg]  # per-segment broadcasts
            return (per_ray[:3].T, per_ray[3], per_ray[4])  # rgb, d, acc

        rgb_r, depth_r, acc_r = rows_to_maps(out_f, n - p, s_f)
        rgb0_r, depth0_r, acc0_r = rows_to_maps(out_c, n - p, s_c)

        # ------------- ss_loss reference-ray megakernels -------------
        ref_outputs = None
        if has_ss:
            d_ref = ref["directions"]
            dn_ref = jnp.linalg.norm(d_ref, axis=-1)
            v_ref = d_ref / jnp.maximum(dn_ref[:, None], 1e-12)
            o_ref_T, d_ref_T, v_ref_T = (
                ref["origins"].T, d_ref.T, v_ref.T
            )
            mult = cfg.ss_loss_mult
            cr_ref = mult * gated_coeff  # same masked-mse rgb coefficient
            if cfg.with_depth_loss:
                cd_ref = mult * jnp.where(
                    s1 > 0, 2.0 * w_ss / jnp.maximum(s1, 1.0), 0.0
                )
                pri_ref = ref["depth_target"]
            else:
                cd_ref = jnp.zeros((n,), jnp.float32)
                pri_ref = jnp.zeros((n,), jnp.float32)
            tgt_ref = ref["rgb_target"]

            kss = jax.random.split(ss_rng, 2)
            t_rand_ref = (
                jax.random.uniform(kss[0], (n, s_c))
                if cfg.perturb > 0 else None
            )
            near_r = jnp.full((n, 1), cfg.near)
            far_r = jnp.full((n, 1), cfg.far)
            z_c_ref = sampling.vanilla_z_vals(
                near_r, far_r, s_c, cfg.lindisp, t_rand_ref
            )

            def ref_rows(z_sub):
                return rows_of(z_sub, dn_ref, cr_ref, tgt_ref, cd_ref,
                               pri_ref)

            pts_rc, views_rc = pts_views_of(o_ref_T, d_ref_T, v_ref_T,
                                            z_c_ref)
            out_rc, dw_rc = mega_level(ws_c, s_c, pts_rc, views_rc,
                                       ref_rows(z_c_ref))
            z_f_ref = pdf_merge.fine_z_vals(
                z_c_ref, out_rc[5].reshape(n, s_c), cfg.N_importance,
                rng=None if det_pdf else kss[1], det=det_pdf,
                use_kernel=cfg.use_pdf_kernel,
                mesh=mesh if sharded else None,
            )
            pts_rf, views_rf = pts_views_of(o_ref_T, d_ref_T, v_ref_T,
                                            z_f_ref)
            out_rf, dw_rf = mega_level(ws_f, s_f, pts_rf, views_rf,
                                       ref_rows(z_f_ref))
            dw_c = [a + b for a, b in zip(dw_c, dw_rc)]
            dw_f = [a + b for a, b in zip(dw_f, dw_rf)]
            r_f = rows_to_maps(out_rf, n, s_f)
            r_c = rows_to_maps(out_rc, n, s_c)
            ref_outputs = {
                "rgb": r_f[0], "depth": r_f[1],
                "rgb0": r_c[0], "depth0": r_c[1],
            }

        # ---------------- patch path: rays [:p] ----------------
        if p > 0:
            rays_p = jax.tree_util.tree_map(lambda x: x[:p], rays)

            def patch_loss(prms):
                wc = _weights_tuple(prms, "coarse", net_depth)
                wf = _weights_tuple(prms, "fine", net_depth)
                pts, views = pts_views(slice(0, p), z_c[:p])
                raw_T = kern_patch(wc, pts, views).reshape(4, p, s_c)
                rgb0, _, acc0, w_p, depth0 = rendering.raw2outputs_T(
                    raw_T, z_c[:p], rays_p.directions, None,
                    cfg.white_bkgd,
                )
                z_all = pdf_merge.fine_z_vals(
                    z_c[:p], w_p, cfg.N_importance,
                    rng=None if det_pdf else jax.random.fold_in(
                        keys[1], 1
                    ),
                    det=det_pdf, use_kernel=cfg.use_pdf_kernel,
                    mesh=mesh if sharded else None,
                )
                pts2, views2 = pts_views(slice(0, p), z_all)
                raw_T2 = kern_patch(wf, pts2, views2).reshape(4, p, s_f)
                rgb, _, acc, _, depth = rendering.raw2outputs_T(
                    raw_T2, z_all, rays_p.directions, None,
                    cfg.white_bkgd,
                )

                # patch rays' share of the per-ray MSE terms, same
                # global-denominator coefficients as the megakernel
                # (tgt/pri carry the output-noise shift when on)
                def share(rgb_l, depth_l, coeff, tgt, pri):
                    se_rgb = jnp.sum(
                        coeff[:p, None] / 2.0
                        * (rgb_l - tgt[:p]) ** 2
                    )
                    se_d = jnp.sum(
                        coeff_d[:p] / 2.0 * (depth_l - pri[:p]) ** 2
                    )
                    return se_rgb + se_d

                loss = (share(rgb, depth, coeff_rgb_f, tgt_f, pri_f)
                        + share(rgb0, depth0, coeff_rgb_c, tgt_c, pri_c))

                # patch-global terms, fine + coarse duplicates; the XLA
                # step's apply_output_noise noises the outputs BEFORE
                # every loss term, so the patch terms see noised maps
                batch_p = {
                    "rgb": target[:p],
                    "mono_disp": batch["mono_disp"][:p],
                }
                for rgb_l, depth_l, nr, nd in (
                    (rgb, depth, n_rgb, n_d),
                    (rgb0, depth0, n_rgb0, n_d0),
                ):
                    if cfg.use_noise:
                        rgb_l = rgb_l + nr[:p]
                        depth_l = depth_l + nd[:p]
                    mono, ssim_v, lp = losses_lib._patch_terms(
                        rgb_l, depth_l, batch_p, cfg, lpips_params
                    )
                    loss = (
                        loss
                        + cfg.mono_depth_loss_mult * mono
                        - cfg.patch_ssim_loss_mult * ssim_v
                        + cfg.patch_lpips_loss_mult * lp
                    )
                return loss, (rgb, depth, rgb0, depth0)

            (_, (rgb_p, depth_p, rgb0_p, depth0_p)), grads = (
                jax.value_and_grad(patch_loss, has_aux=True)(params)
            )
            rgb_full = jnp.concatenate([rgb_p, rgb_r], 0)
            depth_full = jnp.concatenate([depth_p, depth_r], 0)
            rgb0_full = jnp.concatenate([rgb0_p, rgb0_r], 0)
            depth0_full = jnp.concatenate([depth0_p, depth0_r], 0)
        else:
            grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            rgb_full, depth_full = rgb_r, depth_r
            rgb0_full, depth0_full = rgb0_r, depth0_r

        # fold the megakernel's explicit weight grads into the tree
        import flax.core

        frozen = not isinstance(grads, dict)
        grads_u = flax.core.unfreeze(grads) if frozen else grads
        for branch, dws in (("coarse", dw_c), ("fine", dw_f)):
            mega = _grad_branch_dict(dws, params["params"][branch],
                                     net_depth)
            grads_u["params"][branch] = jax.tree_util.tree_map(
                lambda a, b: a + b, grads_u["params"][branch], mega
            )
        grads = flax.core.freeze(grads_u) if frozen else grads_u

        # stats: literally vanilla_losses on the assembled outputs
        outputs_full = {
            "rgb": rgb_full, "depth": depth_full,
            "rgb0": rgb0_full, "depth0": depth0_full,
        }
        if cfg.use_noise:
            # same fold_in(step_rng, 7) stream as the cotangent rows
            outputs_full = step_lib.apply_output_noise(
                outputs_full, cfg, step_rng
            )
        loss, stats = losses_lib.vanilla_losses(
            outputs_full, batch, cfg, far, 1.0, lpips_params
        )
        if has_ss:
            # Re-assemble the gated loss/stats through apply_ss_loss
            # itself (identical rng folds, identical masked-mse
            # formulas); the "apply_fn" just returns the megakernel's
            # reference-ray renders.
            loss, stats = step_lib.apply_ss_loss(
                lambda _p, _r, _rays: ref_outputs, params, step_rng,
                batch, cfg, outputs_full, loss, stats,
            )

        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        new_params = optax.apply_updates(state.params, updates)
        from consistentnerf_tpu.core import mathx

        stats["grad_norm"] = losses_lib.tree_norm(grads)
        stats["lr"] = mathx.exp_lr_decay(
            state.step, cfg.lrate, 0.1, cfg.lrate_decay * 1000
        )
        return (
            TrainState(step=state.step + 1, params=new_params,
                       opt_state=opt_state),
            stats,
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Mip train step built on the megakernel
# ---------------------------------------------------------------------------


def mip_onepass_supported(cfg) -> bool:
    """Whether the mip one-pass step computes cfg's exact loss.

    The per-ray data terms (lossmult RGB MSE, masked depth MSE,
    RegNeRF/train.py:120-156) have parameter-independent global
    denominators and run in-kernel; the MiDaS patch term touches only
    the first 4x16^2 rays (consistency/monodepth.py contract) and the
    TV regularizer only the random-pose rays — both keep the ordinary
    differentiable fused path. Density noise is supported — an additive
    per-point row on the in-kernel density logit (the paper's mipnerf3/
    regnerf3 presets set MLP.density_noise=1). Extras (disp/normal
    metrics) change the kernel's output contract and fall back.
    """
    return (
        cfg.backbone == "mipnerf"
        and cfg.disable_normals
        and cfg.stop_level_grad
        and cfg.min_deg_point == 0
        and 3 * cfg.max_deg_point <= 60
        and not cfg.compute_disp_metrics
        and not cfg.compute_normal_metrics
    )


def _mip_grad_dict(d_list, params_branch, net_depth):
    """flax-layout flat grad list -> the MipMLP branch's grad dict."""
    out = {}
    for i in range(net_depth + 4):
        name = f"Dense_{i}"
        out[name] = {
            "kernel": d_list[2 * i],
            "bias": d_list[2 * i + 1].reshape(
                params_branch[name]["bias"].shape
            ),
        }
    return out


def build_onepass_mip_train_step(
    cfg,
    tx=None,
    donate: bool = True,
    tile=None,
    mesh=None,
):
    """train_step(state, batch, rng) -> (state, stats); the mip/RegNeRF
    loss (train.losses.mip_losses, RegNeRF/train.py:97-241) with every
    level of the data rays running the one-pass megakernel and the
    MiDaS-patch / random-pose-TV rays on the differentiable fused path.
    """
    import optax

    from consistentnerf_tpu.core import mathx, sampling
    from consistentnerf_tpu.models.mlp import MipMLP
    from consistentnerf_tpu.ops import fused_mip as fmip
    from consistentnerf_tpu.ops.fused_train import fused_mip_forward
    from consistentnerf_tpu.train import losses as losses_lib
    from consistentnerf_tpu.train.state import TrainState, make_optimizer

    assert mip_onepass_supported(cfg), (
        "mip one-pass step unsupported for this config; use "
        "build_fused_mip_train_step"
    )
    tx = tx or make_optimizer(cfg)
    tile = tile or cfg.fused_tile
    skip_layer, deg_view = MipMLP.skip_layer, MipMLP.deg_view
    rgb_padding, density_bias = MipMLP.rgb_padding, MipMLP.density_bias
    n_levels = cfg.mip_num_levels
    level_mults = [cfg.coarse_loss_mult] * (n_levels - 1) + [1.0]
    # The MiDaS term reads exactly the first 4x16^2 rays
    # (losses.mip_losses -> midas_patch_loss(..., 16, 4)).
    p_rays = 4 * 16 * 16 if cfg.compute_mono_depth_metrics else 0

    level_kw = dict(
        net_depth=cfg.netdepth, skip_layer=skip_layer,
        num_freqs=cfg.max_deg_point, deg_view=deg_view, tile=tile,
        white_bkgd=cfg.white_bkgd, rgb_padding=rgb_padding,
        density_bias=density_bias,
        compute_dtype=jnp.dtype(cfg.compute_dtype).type,
    )
    sharded = mesh is not None and mesh.size > 1

    def mega_level(ws, seg, *rows):
        call = functools.partial(
            lambda w, *r: onepass_mip_level_T(w, *r, seg=seg, **level_kw)
        )
        if sharded:
            call = _shard_onepass(call, mesh)
        out_rows, d_ws = call(ws, *rows)
        return out_rows, list(d_ws)

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

        rays = batch["rays"]
        n = rays.origins.shape[0]
        p = p_rays
        s = cfg.mip_num_samples

        lossmult = rays.lossmult[:, 0]
        if cfg.disable_multiscale_loss:
            lossmult = jnp.ones_like(lossmult)
        denom_rgb = jnp.sum(lossmult) + 1e-4

        # --- per-ray cotangent coefficient bases (level weight applied
        # per level); see losses.mip_losses rgb_mse/depth_mse ---
        base_crgb = 2.0 * lossmult / denom_rgb
        if cfg.compute_depth_metrics:
            if cfg.dataset_type == "dtu" or cfg.use_hardmask:
                mask = batch["masks"]
                if cfg.dataset_type == "llff":
                    scale = batch["bounds"].max()
                elif cfg.dataset_type == "blender":
                    scale = cfg.far
                else:
                    scale = 1.0
            else:
                mask = jnp.ones((n,), jnp.float32)
                scale = (batch["bounds"].max()
                         if cfg.dataset_type == "llff" else 1.0)
            base_cd = 2.0 * mask * mask / (scale**2 * n)
            prior = batch["dpts"]
        else:
            base_cd = jnp.zeros((n,), jnp.float32)
            prior = jnp.zeros((n,), jnp.float32)

        target = batch["rgb"][..., :3]

        # ---------------- mega path: data rays [p:] ----------------
        rays_r = jax.tree_util.tree_map(lambda x: x[p:], rays)
        params = state.params
        ws = tuple(
            jnp.asarray(w)
            for w in fmip.flatten_mip_params(params, cfg.netdepth)
        )
        nr = n - p
        dnorm_r = jnp.linalg.norm(rays_r.directions, axis=-1)
        views_r = jnp.broadcast_to(
            rays_r.viewdirs.T[:, :, None], (3, nr, s)
        ).reshape(3, nr * s)

        def static_rows(t_vals, lw):
            tmid = 0.5 * (t_vals[:, :-1] + t_vals[:, 1:])
            delta = (t_vals[:, 1:] - t_vals[:, :-1]) * dnorm_r[:, None]
            return (
                tmid.reshape(1, nr * s),
                delta.reshape(1, nr * s),
                _rep_row(t_vals[:, 0], s),
                _rep_row(t_vals[:, -1], s),
                _rep_row(lw * base_crgb[p:], s),
                _rep_row(target[p:], s),
                _rep_row(0.1 * lw * base_cd[p:], s),
                _rep_row(prior[p:], s),
            )

        t_vals = None
        w_render = None
        mega_out = []
        dw_total = None
        for lvl in range(n_levels if nr > 0 else 0):
            lkey = (jax.random.fold_in(key, lvl)
                    if cfg.randomized else None)
            if lvl == 0:
                t_vals, samples = sampling.sample_along_rays(
                    lkey, rays_r.origins, rays_r.directions, rays_r.radii,
                    s, rays_r.near, rays_r.far, cfg.genspace_fn,
                    cfg.ray_shape, cfg.single_jitter, transposed=True,
                )
            else:
                t_vals, samples = sampling.resample_along_rays(
                    lkey, rays_r.origins, rays_r.directions, rays_r.radii,
                    t_vals, w_render, cfg.ray_shape, cfg.stop_level_grad,
                    resample_padding, cfg.single_jitter, transposed=True,
                    use_kernel=cfg.use_pdf_kernel,
                    mesh=mesh if sharded else None,
                )
            means_T, covs_T = samples
            if cfg.disable_integration:
                covs_T = jnp.zeros_like(covs_T)
            rows = static_rows(t_vals, level_mults[lvl])
            # density-regularization noise (MLP.density_noise; fused_
            # train.py applies it between the kernel and compositing —
            # here it is an input row added to the in-kernel logit)
            if cfg.randomized and cfg.density_noise > 0:
                noise = (cfg.density_noise * jax.random.normal(
                    jax.random.fold_in(key, 500 + lvl), (nr, s)
                )).reshape(1, nr * s)
            else:
                noise = jnp.zeros((1, nr * s), jnp.float32)
            out_rows, dws = mega_level(
                ws, s, means_T.reshape(3, nr * s),
                covs_T.reshape(3, nr * s), views_r, *rows, noise,
            )
            w_render = out_rows[5].reshape(nr, s)
            per_ray = out_rows[:, ::s]
            mega_out.append(dict(
                rgb=per_ray[:3].T, distance_mean=per_ray[3],
                acc=per_ray[4],
            ))
            dw_total = dws if dw_total is None else [
                a + b for a, b in zip(dw_total, dws)
            ]
        if nr == 0:
            # Every ray is a MiDaS patch ray (tiny batches): the whole
            # step runs on the differentiable path.
            dw_total = [jnp.zeros_like(w) for w in ws]
            mega_out = [dict(
                rgb=jnp.zeros((0, 3)), distance_mean=jnp.zeros((0,)),
                acc=jnp.zeros((0,)),
            ) for _ in range(n_levels)]

        # ---------- differentiable path: MiDaS patch rays + TV ----------
        def diff_loss(prms):
            loss = jnp.array(0.0)
            patch_out = None
            if p > 0:
                rays_p = jax.tree_util.tree_map(lambda x: x[:p], rays)
                renders_p = fused_mip_forward(
                    prms, jax.random.fold_in(key, 997)
                    if cfg.randomized else None,
                    rays_p, cfg, resample_padding=resample_padding,
                    compute_extras=False, tile=tile,
                )
                patch_out = renders_p
                for lvl, r in enumerate(renders_p):
                    lw = level_mults[lvl]
                    loss = loss + jnp.sum(
                        lw * base_crgb[:p, None] / 2.0
                        * (r["rgb"] - target[:p]) ** 2
                    )
                    loss = loss + jnp.sum(
                        0.1 * lw * base_cd[:p] / 2.0
                        * (r["distance_mean"] - prior[:p]) ** 2
                    )
                    mono = losses_lib.midas_patch_loss(
                        r["distance_mean"].reshape(-1),
                        batch["mono_dpts"].reshape(-1), 16, 4,
                    )
                    if cfg.dataset_type == "blender":
                        mono = mono * 0.01
                    loss = loss + 0.1 * lw * mono
            rr = None
            if render_random:
                rr = fused_mip_forward(
                    prms, key2 if cfg.randomized else None,
                    batch["rays_random"], cfg,
                    resample_padding=resample_padding,
                    compute_extras=True, tile=tile,
                )
                ps = cfg.random_patch_size
                tvw = [cfg.coarse_loss_mult] * (n_levels - 1) + [
                    tvnorm_loss_weight if cfg.depth_tvnorm_decay
                    else cfg.depth_tvnorm_loss_mult
                ]
                for lvl, r in enumerate(rr):
                    depth_patches = r[cfg.depth_tvnorm_selector].reshape(
                        -1, ps, ps, 1
                    )
                    opacity_w = (
                        jax.lax.stop_gradient(
                            r["acc"].reshape(-1, ps, ps, 1)[:, :-1, :-1]
                        ) * cfg.depth_tvnorm_mask_weight
                    )
                    tv = mathx.compute_tv_norm(
                        depth_patches, cfg.depth_tvnorm_type, opacity_w
                    ).mean()
                    loss = loss + tvw[lvl] * tv
            if cfg.weight_decay_mult != 0:
                param_sq = losses_lib.tree_sum(jax.tree_util.tree_map(
                    lambda z: jnp.sum(z**2), prms
                ))
                count = losses_lib.tree_sum(jax.tree_util.tree_map(
                    lambda z: jnp.prod(jnp.array(z.shape)), prms
                ))
                loss = loss + cfg.weight_decay_mult * param_sq / count
            return loss, (patch_out, rr)

        (_, (patch_out, rr)), grads = jax.value_and_grad(
            diff_loss, has_aux=True
        )(params)

        # fold the megakernel's weight grads into the tree
        import flax.core

        frozen = not isinstance(grads, dict)
        grads_u = flax.core.unfreeze(grads) if frozen else grads
        branch = params["params"]
        mname = "MipMLP_0" if "MipMLP_0" in branch else None
        pb = branch[mname] if mname else branch
        mega = _mip_grad_dict(dw_total, pb, cfg.netdepth)
        gb = grads_u["params"][mname] if mname else grads_u["params"]
        merged = jax.tree_util.tree_map(lambda a, b: a + b, gb, mega)
        if mname:
            grads_u["params"][mname] = merged
        else:
            grads_u["params"] = merged
        grads = flax.core.freeze(grads_u) if frozen else grads_u

        # stats: literally mip_losses on the assembled outputs
        renderings = []
        for lvl in range(n_levels):
            m = mega_out[lvl]
            if p > 0:
                pr = patch_out[lvl]
                renderings.append(dict(
                    rgb=jnp.concatenate([pr["rgb"], m["rgb"]], 0),
                    distance_mean=jnp.concatenate(
                        [pr["distance_mean"], m["distance_mean"]], 0
                    ),
                ))
            else:
                renderings.append(dict(
                    rgb=m["rgb"], distance_mean=m["distance_mean"],
                ))
        _, stats = losses_lib.mip_losses(
            renderings, rr, batch, params, cfg, tvnorm_loss_weight
        )
        stats["grad_norm"] = losses_lib.tree_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        new_params = optax.apply_updates(state.params, updates)
        stats["lr"] = mathx.learning_rate_decay(
            state.step, cfg.lr_init, cfg.lr_final, cfg.total_iters,
            cfg.lr_delay_steps, cfg.lr_delay_mult,
        )
        return (
            TrainState(step=state.step + 1, params=new_params,
                       opt_state=opt_state),
            stats,
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
