"""Aligned fused MLP kernels: PE-as-matmul, no in-kernel concats.

Why v2: hardware probes (tools/ab_bench.py) showed Mosaic runs the trunk's
chained [tile,256]x[256,256] bf16 matmuls at the same ~85 TFLOPS as XLA,
but the v1 kernel measured ~11 TFLOPS end-to-end. The deficit is the
positional encoding: the torch-style PE builds 21 three-lane strips and
concatenates them (fused_mlp._posenc), and every skip/viewdir concat is
lane-misaligned (63/319/283) — each one a Mosaic relayout. A single sin
pass over the same volume costs almost nothing (~1.5 ms / 67M elements),
so the trig was never the problem: the LAYOUT was.

v2 restructures the computation so every tensor the kernel touches is
lane-aligned and no concat exists:

* PE becomes a matmul + ONE sin pass over ONE packed [tile, 128]
  register: p = x @ F + B with F [3, 128] holding 2^k at column (3k + j)
  for the sin part AND at column (64 + 3k + j) for the cos part, and the
  static bias B adding pi/2 to the whole high half (sin(t + pi/2) =
  cos(t)); sc = sin(p). The raw-x skip columns ride along at columns
  60..62 via the tiny-angle identity sin(eps*x)/eps ~= x with
  eps = 2^-14 (relative error (eps*x)^2/6 ~= 1e-8, below bf16/fp32
  matmul rounding) — the matching weight rows are pre-scaled by 1/eps,
  which is exact (power of two). Unused high-half columns read
  sin(pi/2) = 1 but hit all-zero weight rows.
* The first layer and every post-skip layer then consume ONE packed
  block: h = relu(h_prev @ Wh + sc @ Wsc + b) — the skip concat is a sum
  of two aligned matmuls, and the PE+x contribution is a single K=128
  MXU pass (v2.0 spent three: x @ Wx, s @ Ws, c @ Wc).
* The viewdir branch gets the same treatment (Fv [3, 128], deg_view
  frequencies, views at the x columns).

Weight blocks are gathered from the torch-layout `flatten_params` list
outside the kernel (row permutations, jit-once), and gradient blocks are
scattered back to the torch layout, so the public contract is identical
to `ops.fused_mlp_train.fused_mlp_train`: flat torch-layout weights in,
[N, 4] out, weight grads only (positions carry no grad in the NeRF step,
run_nerf_view.py:527).
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

PE_W = 128  # aligned width of the packed sin/x/cos register (pts + views)
TILE = 512

# Packed-register column layout: sin at [0, 3F), raw x at [X_OFF, X_OFF+3),
# cos at [COS_OFF, COS_OFF+3F). Requires 3*num_freqs <= X_OFF.
X_OFF = 60
COS_OFF = 64
X_SCALE = 2.0**-14  # tiny-angle factor: sin(X_SCALE*x)/X_SCALE ~= x

# v5e has ~128 MiB of physical VMEM per core but XLA's *scoped* vmem
# allocator defaults to 16 MiB; the backward kernel keeps the full weight
# set, fp32 grad accumulators and the recomputed activations resident
# (~19 MiB at tile 512), so raise the cap explicitly.
_FWD_VMEM_LIMIT = 64 * 1024 * 1024
_BWD_VMEM_LIMIT = 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# Torch-layout <-> aligned-block row maps
# ---------------------------------------------------------------------------


def _pe_row_maps(num_freqs):
    """Row indices of the torch Embedder layout [x, sin_k, cos_k, ...].

    Returns (rows_x, rows_sin, rows_cos): rows_sin[3k + j] is the torch
    row of sin(x_j * 2^k), matching p's column order.
    """
    rows_x = [0, 1, 2]
    rows_sin, rows_cos = [], []
    for k in range(num_freqs):
        for j in range(3):
            rows_sin.append(3 + 6 * k + j)
            rows_cos.append(6 + 6 * k + j)
    return rows_x, rows_sin, rows_cos


def _freq_matrix(num_freqs):
    """F [3, PE_W] for the packed register: p[:, 3k+j] = x_j * 2^k (sin
    half), p[:, COS_OFF+3k+j] = x_j * 2^k (cos half, pi/2 bias added in
    the kernel), p[:, X_OFF+j] = x_j * X_SCALE (raw-x columns)."""
    if 3 * num_freqs > X_OFF:
        raise ValueError(
            f"packed PE register supports at most {X_OFF // 3} freqs, "
            f"got {num_freqs}; use fused_kernel='v1' for this config"
        )
    f = np.zeros((3, PE_W), np.float32)
    for k in range(num_freqs):
        for j in range(3):
            f[j, 3 * k + j] = 2.0**k
            f[j, COS_OFF + 3 * k + j] = 2.0**k
    for j in range(3):
        f[j, X_OFF + j] = X_SCALE
    return jnp.asarray(f)


def _phase_bias():
    """sin(t + pi/2) = cos(t): static phase bias for the whole high half
    of the packed register. Built from an iota (Pallas kernels cannot
    capture array constants). Unused high columns evaluate to
    sin(pi/2) = 1 against all-zero weight rows."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, PE_W), 1)
    return jnp.where(col >= COS_OFF, np.float32(np.pi / 2),
                     np.float32(0.0))


def _pe_layers(net_depth, skips):
    """Trunk layers that consume the PE: layer 0 + every post-skip."""
    return {0} | {s + 1 for s in skips if s + 1 < net_depth}


def _split_pe_weight(w, num_freqs, cd, with_trunk):
    """Split a torch-layout weight [P(+W), out] into aligned blocks.

    Rows 0..3*(1+2F)-1 are the PE part; remaining rows (if with_trunk)
    are the previous activation's part. Returns (wh|None, wsc) where wsc
    [PE_W, out] matches the packed register layout: sin rows at 0..3F-1,
    raw-x rows (pre-scaled by 1/X_SCALE, exact) at X_OFF..X_OFF+2, cos
    rows at COS_OFF..COS_OFF+3F-1.
    """
    rows_x, rows_sin, rows_cos = _pe_row_maps(num_freqs)
    pe_rows = 3 * (1 + 2 * num_freqs)
    out = w.shape[-1]
    wsc = jnp.zeros((PE_W, out), cd)
    wsc = wsc.at[: len(rows_sin)].set(w[jnp.asarray(rows_sin)].astype(cd))
    wsc = wsc.at[X_OFF: X_OFF + 3].set(
        (w[jnp.asarray(rows_x)] * (1.0 / X_SCALE)).astype(cd)
    )
    wsc = wsc.at[COS_OFF: COS_OFF + len(rows_cos)].set(
        w[jnp.asarray(rows_cos)].astype(cd)
    )
    wh = w[pe_rows:].astype(cd) if with_trunk else None
    return wh, wsc


def _merge_pe_grad(dwh, dwsc, num_freqs, shape):
    """Scatter the packed grad block back into the torch row layout."""
    rows_x, rows_sin, rows_cos = _pe_row_maps(num_freqs)
    pe_rows = 3 * (1 + 2 * num_freqs)
    dw = jnp.zeros(shape, jnp.float32)
    # d/dw_torch = d/dw_kernel * (1/X_SCALE) for the pre-scaled x rows.
    dw = dw.at[jnp.asarray(rows_x)].set(
        dwsc[X_OFF: X_OFF + 3] * (1.0 / X_SCALE)
    )
    dw = dw.at[jnp.asarray(rows_sin)].set(dwsc[: len(rows_sin)])
    dw = dw.at[jnp.asarray(rows_cos)].set(
        dwsc[COS_OFF: COS_OFF + len(rows_cos)]
    )
    if dwh is not None:
        dw = dw.at[pe_rows:].set(dwh)
    return dw


def prepare_aligned(weights, net_depth, skips, multires, multires_views,
                    compute_dtype):
    """Torch-layout flat weight list -> aligned kernel operand list.

    Operand order (static, mirrored by the kernels):
      F, Fv,
      per trunk layer i: [Wh_i]? [Wsc_i]? b_i
      Wa, ba, Wf, bf, Wv_f, Wv_sc, bv, Wr, br
    Biases stay fp32 [1, C].
    """
    cd = compute_dtype
    pe_layers = _pe_layers(net_depth, skips)
    ops = [_freq_matrix(multires), _freq_matrix(multires_views)]
    wi = 0
    for i in range(net_depth):
        w, b = weights[wi], weights[wi + 1]
        wi += 2
        if i in pe_layers:
            wh, wsc = _split_pe_weight(
                w, multires, cd, with_trunk=(i != 0)
            )
            if wh is not None:
                ops.append(wh)
            ops.append(wsc)
        else:
            ops.append(w.astype(cd))
        ops.append(b.astype(jnp.float32))
    alpha_w, alpha_b = weights[wi], weights[wi + 1]
    feat_w, feat_b = weights[wi + 2], weights[wi + 3]
    v_w, v_b = weights[wi + 4], weights[wi + 5]
    rgb_w, rgb_b = weights[wi + 6], weights[wi + 7]
    ops += [alpha_w.astype(cd), alpha_b.astype(jnp.float32),
            feat_w.astype(cd), feat_b.astype(jnp.float32)]
    # views_0 rows: [feat (W), v (3), sin/cos PE (6*deg)]
    feat_dim = feat_w.shape[-1]
    vh = v_w[:feat_dim].astype(cd)
    _, vsc = _split_pe_weight(
        v_w[feat_dim:], multires_views, cd, with_trunk=False
    )
    ops += [vh, vsc, v_b.astype(jnp.float32),
            rgb_w.astype(cd), rgb_b.astype(jnp.float32)]
    return ops


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b, cd):
    """a [T, M] @ b [T, N] contracted over T -> [M, N] fp32."""
    return jax.lax.dot_general(
        a, b.astype(cd), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _aligned_forward(pts, views, ops, *, net_depth, skips, compute_dtype,
                     transposed=False):
    """Forward on aligned operands. Returns (out, residuals).

    transposed=True: pts/views arrive as [3, T] (lane-major point
    stream — a [N, 3] HBM array pads 3 lanes to 128, a 42x traffic
    blowup; [3, N] pads 3 sublanes to 8) and the output is [4, T]. The
    phase matmul becomes a dim0-dim0 contraction (the same form as the
    backward's weight-grad matmuls, which Mosaic runs at full rate);
    activations stay row-major [T, C] internally either way.
    """
    cd = compute_dtype
    it = iter(ops)
    F = next(it)
    Fv = next(it)
    pe_layers = _pe_layers(net_depth, skips)

    x32 = pts.astype(jnp.float32)
    if transposed:
        phases = jax.lax.dot_general(
            x32, F, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        phases = _dot(x32, F)
    sc = jnp.sin(phases + _phase_bias()).astype(cd)

    acts = []
    h = None
    for i in range(net_depth):
        pre = 0.0
        if i in pe_layers:
            if i != 0:
                wh = next(it)
                pre = _dot(h, wh)
            wsc = next(it)
            pre = pre + _dot(sc, wsc)
        else:
            wh = next(it)
            pre = _dot(h, wh)
        b = next(it)
        h = jnp.maximum(pre + b, 0.0).astype(cd)
        acts.append(h)

    wa, ba = next(it), next(it)
    wf, bf = next(it), next(it)
    feat = (_dot(h, wf) + bf).astype(cd)

    v32 = views.astype(jnp.float32)
    if transposed:
        vphases = jax.lax.dot_general(
            v32, Fv, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        vphases = _dot(v32, Fv)
    vsc = jnp.sin(vphases + _phase_bias()).astype(cd)

    wvh, wvsc, bv = next(it), next(it), next(it)
    hv = jnp.maximum(
        _dot(feat, wvh) + _dot(vsc, wvsc) + bv, 0.0
    ).astype(cd)
    wr, br = next(it), next(it)
    if transposed:
        # Emit [3, T]/[1, T] straight off the MXU ((0,)x(1,)
        # contractions) instead of transposing a [T, 4] concat per tile.
        rgb_T = jax.lax.dot_general(
            wr, hv, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + br.T
        alpha_T = jax.lax.dot_general(
            wa, h, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ba.T
        out = jnp.concatenate([rgb_T, alpha_T], axis=0)
    else:
        alpha = _dot(h, wa) + ba
        rgb = _dot(hv, wr) + br
        out = jnp.concatenate([rgb, alpha], axis=-1)
    res = dict(sc=sc, vsc=vsc, acts=acts, feat=feat, hv=hv)
    return out, res


def _op_walk(ops, net_depth, skips):
    """Static walk of the aligned operand list -> named index maps."""
    pe_layers = _pe_layers(net_depth, skips)
    it = iter(range(len(ops)))
    idx = dict(F=next(it), Fv=next(it))
    layers = []
    for i in range(net_depth):
        d = {}
        if i in pe_layers:
            if i != 0:
                d["wh"] = next(it)
            d["wsc"] = next(it)
        else:
            d["wh"] = next(it)
        d["b"] = next(it)
        layers.append(d)
    for k in ("wa", "ba", "wf", "bf", "wvh", "wvsc", "bv", "wr", "br"):
        idx[k] = next(it)
    return idx, layers


def _aligned_forward_streams(pts_chunks, views_chunks, ops, *, net_depth,
                             skips, compute_dtype):
    """Transposed forward over several independent column chunks with the
    LAYER loop outermost, so adjacent matmuls belong to different chunks
    and carry no data dependency — the single-chain forward otherwise
    leaves the MXUs latency-bound. Returns the list of [4, chunk] outs."""
    cd = compute_dtype
    idx, layers = _op_walk(ops, net_depth, skips)
    F, Fv = ops[idx["F"]], ops[idx["Fv"]]
    nc = len(pts_chunks)

    def dot0(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    bias = _phase_bias()
    sc = [jnp.sin(dot0(p.astype(jnp.float32), F) + bias).astype(cd)
          for p in pts_chunks]
    h = [None] * nc
    for d in layers:
        pre = [None] * nc
        if "wh" in d:
            for c in range(nc):
                pre[c] = _dot(h[c], ops[d["wh"]])
        if "wsc" in d:
            for c in range(nc):
                contrib = _dot(sc[c], ops[d["wsc"]])
                pre[c] = contrib if pre[c] is None else pre[c] + contrib
        for c in range(nc):
            h[c] = jnp.maximum(pre[c] + ops[d["b"]], 0.0).astype(cd)

    alpha_T = [jax.lax.dot_general(
        ops[idx["wa"]], h[c], dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ops[idx["ba"]].T for c in range(nc)]
    feat = [(_dot(h[c], ops[idx["wf"]]) + ops[idx["bf"]]).astype(cd)
            for c in range(nc)]
    vsc = [jnp.sin(dot0(v.astype(jnp.float32), Fv) + bias).astype(cd)
           for v in views_chunks]
    hv = [jnp.maximum(
        _dot(feat[c], ops[idx["wvh"]]) + _dot(vsc[c], ops[idx["wvsc"]])
        + ops[idx["bv"]], 0.0).astype(cd) for c in range(nc)]
    def dot_out(w, a):
        return jax.lax.dot_general(
            w, a, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    rgb_T = [dot_out(ops[idx["wr"]], hv[c]) + ops[idx["br"]].T
             for c in range(nc)]
    return [jnp.concatenate([rgb_T[c], alpha_T[c]], axis=0)
            for c in range(nc)]


def _aligned_backward(g, pts, views, ops, *, net_depth, skips,
                      compute_dtype, transposed=False):
    """Recompute forward, return grads for the ALIGNED operand list
    (None for F/Fv which are constants).

    transposed=True: pts/views are [3, T] and g is [4, T] (see
    _aligned_forward); every weight grad keeps its normal shape."""
    _, r = _aligned_forward(
        pts, views, ops, net_depth=net_depth, skips=skips,
        compute_dtype=compute_dtype, transposed=transposed,
    )
    return _aligned_backward_from_res(
        g, r, ops, net_depth=net_depth, skips=skips,
        compute_dtype=compute_dtype, transposed=transposed,
    )


def _aligned_backward_from_res(g, r, ops, *, net_depth, skips,
                               compute_dtype, transposed=False):
    """Grads for the aligned operand list from SAVED forward residuals
    (the dict _aligned_forward returns). Lets a single-pass kernel reuse
    its forward activations instead of recomputing them."""
    cd = compute_dtype
    pe_layers = _pe_layers(net_depth, skips)

    # Walk the operand list once more to index weights per layer.
    it = iter(range(len(ops)))
    idx_F, idx_Fv = next(it), next(it)
    layer_idx = []
    for i in range(net_depth):
        d = {}
        if i in pe_layers:
            if i != 0:
                d["wh"] = next(it)
            d["wsc"] = next(it)
        else:
            d["wh"] = next(it)
        d["b"] = next(it)
        layer_idx.append(d)
    idx_wa, idx_ba = next(it), next(it)
    idx_wf, idx_bf = next(it), next(it)
    idx_wvh, idx_wvsc, idx_bv = next(it), next(it), next(it)
    idx_wr, idx_br = next(it), next(it)

    grads = [None] * len(ops)

    def relu_mask(a):
        return a.astype(jnp.float32) > 0

    if transposed:
        # g is [4, T]: contract over the T axis directly (dims (0,)x(1,))
        # instead of materializing [T, 3] slices of a lane-padded array.
        def dot_gT(a, gT):  # a [T, M], gT [C, T] -> [M, C] fp32
            return jax.lax.dot_general(
                a, gT.astype(cd),
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def gT_dot(gT, w):  # gT [C, T], w [M, C] -> [T, M] fp32
            return jax.lax.dot_general(
                gT.astype(cd), w,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        g_rgb_T = g[:3]
        g_alpha_T = g[3:4]
        grads[idx_wr] = dot_gT(r["hv"], g_rgb_T)
        grads[idx_br] = jnp.sum(g_rgb_T, axis=1)[None, :]
        g_hv = gT_dot(g_rgb_T, ops[idx_wr]) * relu_mask(r["hv"])
    else:
        g_rgb = g[:, :3]
        grads[idx_wr] = _dot_t(r["hv"], g_rgb, cd)
        grads[idx_br] = jnp.sum(g_rgb, axis=0, keepdims=True)
        g_hv = _dot(g_rgb.astype(cd), ops[idx_wr].T) * relu_mask(r["hv"])
    g_hv_c = g_hv.astype(cd)
    grads[idx_wvh] = _dot_t(r["feat"], g_hv, cd)
    grads[idx_wvsc] = _dot_t(r["vsc"], g_hv, cd)
    grads[idx_bv] = jnp.sum(g_hv, axis=0, keepdims=True)

    g_feat = _dot(g_hv_c, ops[idx_wvh].T)
    h_last = r["acts"][-1]
    grads[idx_wf] = _dot_t(h_last, g_feat, cd)
    grads[idx_bf] = jnp.sum(g_feat, axis=0, keepdims=True)
    if transposed:
        grads[idx_wa] = dot_gT(h_last, g_alpha_T)
        grads[idx_ba] = jnp.sum(g_alpha_T, axis=1)[None, :]
        g_h = _dot(g_feat.astype(cd), ops[idx_wf].T) + gT_dot(
            g_alpha_T, ops[idx_wa]
        )
    else:
        g_alpha = g[:, 3:4]
        grads[idx_wa] = _dot_t(h_last, g_alpha, cd)
        grads[idx_ba] = jnp.sum(g_alpha, axis=0, keepdims=True)
        g_h = (_dot(g_feat.astype(cd), ops[idx_wf].T)
               + _dot(g_alpha.astype(cd), ops[idx_wa].T))
    for i in reversed(range(net_depth)):
        d = layer_idx[i]
        g_pre = g_h * relu_mask(r["acts"][i])
        g_pre_c = g_pre.astype(cd)
        h_prev = r["acts"][i - 1] if i > 0 else None
        if "wh" in d:
            grads[d["wh"]] = _dot_t(h_prev, g_pre, cd)
        if "wsc" in d:
            grads[d["wsc"]] = _dot_t(r["sc"], g_pre, cd)
        grads[d["b"]] = jnp.sum(g_pre, axis=0, keepdims=True)
        if i > 0:
            if "wh" in d:
                g_h = _dot(g_pre_c, ops[d["wh"]].T)
            else:
                g_h = jnp.zeros_like(g_h)  # unreachable for valid skips
    return grads


# ---------------------------------------------------------------------------
# Pallas wrappers
# ---------------------------------------------------------------------------


def _pad_rows(x, n):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)


def _pad_cols(x, n):
    pad = n - x.shape[1]
    if pad <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((x.shape[0], pad), x.dtype)], 1
    )


def _whole(w):
    return pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _fwd_pallas(weights, pts, views, net_depth, skips, multires,
                multires_views, tile, interpret, compute_dtype,
                out_lanes: int = 128):
    """out_lanes: lane width of the output buffer. 4 is the logical width
    (rgb+sigma) but a 4-lane VMEM->HBM write every grid step is a Mosaic
    relayout; padding the write to a full 128-lane register (sliced off
    outside) measures faster on v5e despite the extra bytes."""
    interpret = fm.auto_interpret(interpret)
    ops = prepare_aligned(weights, net_depth, skips, multires,
                          multires_views, compute_dtype)
    n = pts.shape[0]
    n_pad = -(-n // tile) * tile
    pts_p = _pad_rows(pts, n_pad)
    views_p = _pad_rows(views, n_pad)
    grid = (n_pad // tile,)

    def kernel(pts_ref, views_ref, *refs):
        *op_refs, out_ref = refs
        vals = [r[:] for r in op_refs]
        out, _ = _aligned_forward(
            pts_ref[:], views_ref[:], vals, net_depth=net_depth,
            skips=tuple(skips), compute_dtype=compute_dtype,
        )
        if out_lanes > 4:
            out = jnp.concatenate(
                [out, jnp.zeros((out.shape[0], out_lanes - 4), out.dtype)],
                axis=-1,
            )
        out_ref[:] = out

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [_whole(w) for w in ops],
        out_specs=pl.BlockSpec((tile, out_lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(pts_p, views_p, *ops)
    return out[:n, :4]


def _fwd_pallas_T(weights, pts_T, views_T, net_depth, skips, multires,
                  multires_views, tile, interpret, compute_dtype,
                  streams: int = 1):
    """Transposed point-stream forward: pts/views [3, N] -> out [4, N].

    The row-major [N, 3] / [N, 4] arrays pad 3-4 lanes to 128 in HBM
    (T(8,128) tiling), a ~42x traffic blowup on every producer/consumer;
    the [3, N] / [4, N] orientation pads sublanes 3->8 only.

    streams > 1: interleave that many independent column chunks per tile
    (see _aligned_forward_streams)."""
    interpret = fm.auto_interpret(interpret)
    if not interpret:
        # Mosaic requires the lane (last) block dim be a multiple of 128.
        tile = max(128, -(-tile // 128) * 128)
    ops = prepare_aligned(weights, net_depth, skips, multires,
                          multires_views, compute_dtype)
    n = pts_T.shape[1]
    n_pad = -(-n // tile) * tile
    pts_p = _pad_cols(pts_T, n_pad)
    views_p = _pad_cols(views_T, n_pad)
    grid = (n_pad // tile,)
    chunk = tile // streams

    def kernel(pts_ref, views_ref, *refs):
        *op_refs, out_ref = refs
        vals = [r[:] for r in op_refs]
        if streams == 1:
            out, _ = _aligned_forward(
                pts_ref[:], views_ref[:], vals, net_depth=net_depth,
                skips=tuple(skips), compute_dtype=compute_dtype,
                transposed=True,
            )
            out_ref[:] = out
        else:
            sls = [slice(s * chunk, (s + 1) * chunk)
                   for s in range(streams)]
            outs = _aligned_forward_streams(
                [pts_ref[:, sl] for sl in sls],
                [views_ref[:, sl] for sl in sls],
                vals, net_depth=net_depth, skips=tuple(skips),
                compute_dtype=compute_dtype,
            )
            for sl, o in zip(sls, outs):
                out_ref[:, sl] = o

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [_whole(w) for w in ops],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(pts_p, views_p, *ops)
    return out[:, :n]


def _bwd_pallas(weights, pts, views, g, net_depth, skips, multires,
                multires_views, tile, interpret, compute_dtype):
    interpret = fm.auto_interpret(interpret)
    ops = prepare_aligned(weights, net_depth, skips, multires,
                          multires_views, compute_dtype)
    n = pts.shape[0]
    n_pad = -(-n // tile) * tile
    pts_p = _pad_rows(pts, n_pad)
    views_p = _pad_rows(views, n_pad)
    g_p = _pad_rows(g, n_pad)
    grid = (n_pad // tile,)

    # Grad slots: every aligned op except F/Fv (constants). Keep the op
    # list positions; emit zeros-shaped outputs only for trainable slots.
    trainable = list(range(2, len(ops)))

    def kernel(pts_ref, views_ref, g_ref, *refs):
        op_refs = refs[: len(ops)]
        out_refs = refs[len(ops): len(ops) + len(trainable)]
        acc_refs = refs[len(ops) + len(trainable):]
        vals = [r[:] for r in op_refs]
        tile_grads = _aligned_backward(
            g_ref[:], pts_ref[:], views_ref[:], vals,
            net_depth=net_depth, skips=tuple(skips),
            compute_dtype=compute_dtype,
        )
        is_first = pl.program_id(0) == 0
        is_last = pl.program_id(0) == pl.num_programs(0) - 1
        for slot, (a_ref, o_ref) in enumerate(zip(acc_refs, out_refs)):
            tg = tile_grads[trainable[slot]]

            @pl.when(is_first)
            def _(a_ref=a_ref, tg=tg):
                a_ref[:] = tg

            @pl.when(jnp.logical_not(is_first))
            def _(a_ref=a_ref, tg=tg):
                a_ref[:] = a_ref[:] + tg

            @pl.when(is_last)
            def _(a_ref=a_ref, o_ref=o_ref):
                o_ref[:] = a_ref[:]

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
        ] + [_whole(w) for w in ops],
        out_specs=tuple(_whole(ops[t]) for t in trainable),
        out_shape=tuple(
            jax.ShapeDtypeStruct(ops[t].shape, jnp.float32)
            for t in trainable
        ),
        scratch_shapes=[
            pltpu.VMEM(ops[t].shape, jnp.float32) for t in trainable
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(pts_p, views_p, g_p, *ops)

    # Scatter the aligned grads back into the torch weight layout.
    aligned_grads = [None, None] + list(grads)
    return _recombine_grads(aligned_grads, weights, net_depth, skips,
                            multires, multires_views)


def _bwd_pallas_T(weights, pts_T, views_T, g_T, net_depth, skips, multires,
                  multires_views, tile, interpret, compute_dtype):
    """Transposed-stream backward: pts/views [3, N], g [4, N]."""
    interpret = fm.auto_interpret(interpret)
    if not interpret:
        # Mosaic requires the lane (last) block dim be a multiple of 128.
        tile = max(128, -(-tile // 128) * 128)
    ops = prepare_aligned(weights, net_depth, skips, multires,
                          multires_views, compute_dtype)
    n = pts_T.shape[1]
    n_pad = -(-n // tile) * tile
    pts_p = _pad_cols(pts_T, n_pad)
    views_p = _pad_cols(views_T, n_pad)
    g_p = _pad_cols(g_T, n_pad)
    grid = (n_pad // tile,)
    trainable = list(range(2, len(ops)))

    def kernel(pts_ref, views_ref, g_ref, *refs):
        op_refs = refs[: len(ops)]
        out_refs = refs[len(ops): len(ops) + len(trainable)]
        acc_refs = refs[len(ops) + len(trainable):]
        vals = [r[:] for r in op_refs]
        tile_grads = _aligned_backward(
            g_ref[:], pts_ref[:], views_ref[:], vals,
            net_depth=net_depth, skips=tuple(skips),
            compute_dtype=compute_dtype, transposed=True,
        )
        is_first = pl.program_id(0) == 0
        is_last = pl.program_id(0) == pl.num_programs(0) - 1
        for slot, (a_ref, o_ref) in enumerate(zip(acc_refs, out_refs)):
            tg = tile_grads[trainable[slot]]

            @pl.when(is_first)
            def _(a_ref=a_ref, tg=tg):
                a_ref[:] = tg

            @pl.when(jnp.logical_not(is_first))
            def _(a_ref=a_ref, tg=tg):
                a_ref[:] = a_ref[:] + tg

            @pl.when(is_last)
            def _(a_ref=a_ref, o_ref=o_ref):
                o_ref[:] = a_ref[:]

    grads = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [_whole(w) for w in ops],
        out_specs=tuple(_whole(ops[t]) for t in trainable),
        out_shape=tuple(
            jax.ShapeDtypeStruct(ops[t].shape, jnp.float32)
            for t in trainable
        ),
        scratch_shapes=[
            pltpu.VMEM(ops[t].shape, jnp.float32) for t in trainable
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(pts_p, views_p, g_p, *ops)

    aligned_grads = [None, None] + list(grads)
    return _recombine_grads(aligned_grads, weights, net_depth, skips,
                            multires, multires_views)


def _recombine_grads(ag, weights, net_depth, skips, multires,
                     multires_views):
    """Aligned grad list (op positions) -> torch-layout grad list."""
    pe_layers = _pe_layers(net_depth, skips)
    it = iter(range(len(ag)))
    next(it), next(it)  # F, Fv
    out = []
    wi = 0
    for i in range(net_depth):
        w = weights[wi]
        if i in pe_layers:
            dwh = ag[next(it)] if i != 0 else None
            dwsc = ag[next(it)]
            out.append(_merge_pe_grad(dwh, dwsc, multires, w.shape))
        else:
            out.append(ag[next(it)])
        out.append(ag[next(it)])  # bias
        wi += 2
    out.append(ag[next(it)])  # wa
    out.append(ag[next(it)])  # ba
    out.append(ag[next(it)])  # wf
    out.append(ag[next(it)])  # bf
    dvh = ag[next(it)]
    dvsc = ag[next(it)]
    v_w = weights[wi + 4]
    feat_dim = weights[wi + 2].shape[-1]
    dv = jnp.zeros(v_w.shape, jnp.float32)
    dv = dv.at[:feat_dim].set(dvh)
    dv = dv.at[feat_dim:].set(
        _merge_pe_grad(None, dvsc, multires_views,
                       (v_w.shape[0] - feat_dim, v_w.shape[1]))
    )
    out.append(dv)
    out.append(ag[next(it)])  # bv
    out.append(ag[next(it)])  # wr
    out.append(ag[next(it)])  # br
    return out


# ---------------------------------------------------------------------------
# Public custom-VJP op
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9),
)
def fused_mlp_v2_train(
    weights: Sequence[jnp.ndarray],
    pts: jnp.ndarray,
    views: jnp.ndarray,
    net_depth: int = 8,
    skips: tuple = (4,),
    multires: int = 10,
    multires_views: int = 4,
    tile: int = TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
):
    """Differentiable aligned fused MLP; same contract as fused_mlp_train
    (torch-layout flat weights, biases [1, C] fp32, returns [N, 4])."""
    return _fwd_pallas(weights, pts, views, net_depth, skips, multires,
                       multires_views, tile, interpret, compute_dtype)


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
    return tuple(d_weights), jnp.zeros_like(pts), jnp.zeros_like(views)


fused_mlp_v2_train.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11),
)
def fused_mlp_v2_train_T(
    weights: Sequence[jnp.ndarray],
    pts_T: jnp.ndarray,
    views_T: jnp.ndarray,
    net_depth: int = 8,
    skips: tuple = (4,),
    multires: int = 10,
    multires_views: int = 4,
    tile: int = TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
    fwd_tile: int | None = None,
    fwd_streams: int = 1,
):
    """Transposed-stream differentiable fused MLP: pts/views [3, N] in,
    raw [4, N] out (cotangent arrives [4, N] too). Same math as
    fused_mlp_v2_train; preferred in the train step because the [N, 3/4]
    orientation pads to 128 lanes in HBM (~42x traffic) on every
    producer and consumer, while [3/4, N] pads sublanes only.

    tile sizes the backward grid (VMEM-bound: weights + fp32 grad
    accumulators + recomputed activations resident); fwd_tile (default
    tile) sizes the forward grid independently — the forward holds only
    one tile of activations, so larger tiles pipeline the MXU better."""
    return _fwd_pallas_T(weights, pts_T, views_T, net_depth, skips,
                         multires, multires_views, fwd_tile or tile,
                         interpret, compute_dtype, fwd_streams)


def _vjp_fwd_T(weights, pts_T, views_T, net_depth, skips, multires,
               multires_views, tile, interpret, compute_dtype, fwd_tile,
               fwd_streams):
    out = _fwd_pallas_T(weights, pts_T, views_T, net_depth, skips,
                        multires, multires_views, fwd_tile or tile,
                        interpret, compute_dtype, fwd_streams)
    return out, (weights, pts_T, views_T)


def _vjp_bwd_T(net_depth, skips, multires, multires_views, tile, interpret,
               compute_dtype, fwd_tile, fwd_streams, residuals, g):
    weights, pts_T, views_T = residuals
    d_weights = _bwd_pallas_T(
        weights, pts_T, views_T, g, net_depth, skips, multires,
        multires_views, tile, interpret, compute_dtype,
    )
    return (tuple(d_weights), jnp.zeros_like(pts_T),
            jnp.zeros_like(views_T))


fused_mlp_v2_train_T.defvjp(_vjp_fwd_T, _vjp_bwd_T)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9),
)
def hybrid_mlp_v2_train(
    weights: Sequence[jnp.ndarray],
    pts: jnp.ndarray,
    views: jnp.ndarray,
    net_depth: int = 8,
    skips: tuple = (4,),
    multires: int = 10,
    multires_views: int = 4,
    tile: int = TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
):
    """XLA forward + aligned Pallas backward.

    Measured on v5e (coarse point count 327k, bf16): XLA's forward runs
    the huge-M matmuls at near-peak (6.1 ms vs the Pallas forward's 7.8),
    while the aligned Pallas backward (in-VMEM activation recompute, no
    HBM activation round-trip) beats XLA's backward ~2x (10.5 ms vs 22).
    This keeps the best half of each; contract identical to
    `fused_mlp_v2_train`."""
    from consistentnerf_tpu.ops.fused_mlp_train import _fwd_xla

    return _fwd_xla(weights, pts, views, net_depth, skips, multires,
                    multires_views, compute_dtype)


def _hybrid_vjp_fwd(weights, pts, views, net_depth, skips, multires,
                    multires_views, tile, interpret, compute_dtype):
    from consistentnerf_tpu.ops.fused_mlp_train import _fwd_xla

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
    return tuple(d_weights), jnp.zeros_like(pts), jnp.zeros_like(views)


hybrid_mlp_v2_train.defvjp(_hybrid_vjp_fwd, _hybrid_vjp_bwd)


def fused_mlp_v2(params, pts, viewdirs, *, net_depth=8, skips=(4,),
                 multires=10, multires_views=4, tile=TILE,
                 interpret=None, compute_dtype=jnp.float32):
    """Forward-only aligned kernel from a NeRFMLP param tree (render/eval
    fast path; drop-in for ops.fused_mlp.fused_mlp)."""
    weights = [jnp.asarray(w) for w in
               fm.flatten_params(params, True, net_depth)]
    weights = [w[None, :] if w.ndim == 1 else w for w in weights]
    return _fwd_pallas(weights, pts, viewdirs, net_depth, tuple(skips),
                       multires, multires_views, tile, interpret,
                       compute_dtype)
