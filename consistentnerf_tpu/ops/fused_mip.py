"""Aligned fused MipMLP kernels (IPE-as-matmul, no in-kernel concats).

Same design as `ops.fused_mlp_v2` applied to the mip backbone
(`RegNeRF/internal/models.py:173-280` semantics, via models/mlp.py::MipMLP):

* The IPE becomes two matmuls + ONE sin pass on ONE packed [tile, 128]
  register: p = means @ F and pv = covs_diag @ F2 with F [3, 128]
  holding 2^k at column 3k+j (sin half) AND at column 64+3k+j (cos
  half; F2 holds 4^k in both halves), then
  sc = exp(-pv/2) * safe_sin(p + B) where the static bias B adds pi/2
  to the high half (sin(t + pi/2) = cos(t); the damping is identical
  for both halves). Column order within each half matches
  mip.py:160-192 (all sin, then all cos). Range reduction matches
  mathx.safe_sin (x % 100pi for |x| >= 100pi).
* The first trunk layer consumes ONE packed block Wsc (sin rows 0:48 at
  block rows 0.., cos rows 48:96 at block rows 64..); the post-skip
  layer (input [act, inputs], models.py:112-113 order) splits into
  Wh/Wsc; the viewdir layer (input [bottleneck, viewdirs_enc], :165)
  splits into Wvh/Wvsc with the RAW viewdirs folded into the packed
  view register at columns 60..62 via the exact-scaled tiny-angle
  identity sin(2^-14 v) * 2^14 ~= v (matching weight rows pre-scaled).
* Outputs are the RAW heads [N, 4] = [rgb_raw(3), density_raw(1)] —
  sigmoid/rgb-padding/softplus/density-noise stay outside the kernel
  (they touch rng and config, and cost nothing in XLA).

The custom-VJP backward recomputes activations inside VMEM (no HBM
activation round-trip) and accumulates fp32 weight grads in VMEM-resident
scratch across the sequential grid, exactly like fused_mlp_v2. means/covs
/views carry no gradient (cone samples are stop-gradient'ed or
param-independent in both train levels, models/mipnerf.py:82-93), so
input cotangents are zero.

Normals (`disable_normals=False`) need d(density)/d(means) per point:
`fused_mip_mlp_normals_T` computes the analytic dx walk INSIDE the
forward kernel (density-head cotangent back through the relu trunk, then
the PE's closed-form Jacobian) while activations are still VMEM-resident
— rows 4:7 of its [7, N] output. The TRAIN step still requires
cfg.disable_normals (normals feed no reference loss — eval/vis only,
RegNeRF/train.py:97-241); the render path supports both.
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

PE_W = 128
TILE = 1024

# Packed-register column layout (same as fused_mlp_v2): sin at [0, 3F),
# raw input at [X_OFF, X_OFF+3) (view register only), cos at
# [COS_OFF, COS_OFF+3F). Requires 3*num_freqs <= X_OFF.
X_OFF = 60
COS_OFF = 64
X_SCALE = 2.0**-14

_FWD_VMEM_LIMIT = 64 * 1024 * 1024
_BWD_VMEM_LIMIT = 100 * 1024 * 1024

_SAFE_T = float(100 * np.pi)


def flatten_mip_params(params, net_depth: int = 8) -> list:
    """MipMLP param tree -> flat [w0, b0, ..., w11, b11] list.

    Accepts the full model tree ({'params': {'MipMLP_0': ...}}) or the
    MLP-level dict ({'Dense_0': ...}). Layer order (nn.compact creation,
    models/mlp.py:97-173): Dense_0..Dense_{D-1} trunk, Dense_D density,
    Dense_{D+1} bottleneck, Dense_{D+2} viewdir, Dense_{D+3} rgb.
    """
    p = params.get("params", params)
    if "MipMLP_0" in p:
        p = p["MipMLP_0"]
    out = []
    for i in range(net_depth + 4):
        d = p[f"Dense_{i}"]
        out += [d["kernel"], d["bias"]]
    return out


def _freq_matrix(num_freqs, power, with_x=False):
    """Packed F [3, PE_W]: p[:, 3k+j] = p[:, COS_OFF+3k+j] = x_j *
    power^k; optionally the raw input at the X_OFF columns (scaled by
    X_SCALE, view register only)."""
    if 3 * num_freqs > X_OFF:
        raise ValueError(
            f"packed IPE register supports at most {X_OFF // 3} freqs, "
            f"got {num_freqs}"
        )
    f = np.zeros((3, PE_W), np.float32)
    for k in range(num_freqs):
        for j in range(3):
            f[j, 3 * k + j] = float(power) ** k
            f[j, COS_OFF + 3 * k + j] = float(power) ** k
    if with_x:
        for j in range(3):
            f[j, X_OFF + j] = X_SCALE
    return jnp.asarray(f)


def _phase_bias():
    """pi/2 on the high half: sin(t + pi/2) = cos(t). Built from an iota
    (Pallas kernels cannot capture array constants)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, PE_W), 1)
    return jnp.where(col >= COS_OFF, np.float32(np.pi / 2),
                     np.float32(0.0))


def prepare_mip_aligned(weights, net_depth, skip_layer, num_freqs, deg_view,
                        compute_dtype):
    """Flat flax-layout weight list -> aligned kernel operand list.

    Operand order (static, mirrored by the kernels):
      F, F2, Fv,
      layer 0: Wsc, b
      layers 1..D-1: Wh [, Wsc if post-skip] b
      Wd, bd, Wb, bb, Wvh, Wvsc, bv, Wr, br
    Biases stay fp32 [1, C].
    """
    cd = compute_dtype
    pe_rows = 3 * num_freqs  # rows of the sin block (cos block same)
    ops = [
        _freq_matrix(num_freqs, 2.0),
        _freq_matrix(num_freqs, 4.0),
        _freq_matrix(deg_view, 2.0, with_x=True),
    ]

    def pack_sc(w_sin, w_cos, out):
        wsc = jnp.zeros((PE_W, out), cd)
        wsc = wsc.at[: w_sin.shape[0]].set(w_sin.astype(cd))
        wsc = wsc.at[COS_OFF: COS_OFF + w_cos.shape[0]].set(
            w_cos.astype(cd)
        )
        return wsc

    wi = 0
    post_skip = {i for i in range(1, net_depth)
                 if (i - 1) % skip_layer == 0 and (i - 1) > 0}
    for i in range(net_depth):
        w, b = weights[wi], weights[wi + 1]
        wi += 2
        if i == 0:
            ops.append(pack_sc(w[:pe_rows], w[pe_rows:], w.shape[-1]))
        elif i in post_skip:
            trunk_rows = w.shape[0] - 2 * pe_rows
            ops += [
                w[:trunk_rows].astype(cd),
                pack_sc(w[trunk_rows: trunk_rows + pe_rows],
                        w[trunk_rows + pe_rows:], w.shape[-1]),
            ]
        else:
            ops.append(w.astype(cd))
        ops.append(jnp.asarray(b, jnp.float32).reshape(1, -1))
    wd, bd = weights[wi], weights[wi + 1]
    wb, bb = weights[wi + 2], weights[wi + 3]
    wv, bv = weights[wi + 4], weights[wi + 5]
    wr, br = weights[wi + 6], weights[wi + 7]
    width = wb.shape[-1]
    vh = wv[:width].astype(cd)
    # viewdir rows: [bneck (width), v (3), sin (3*deg), cos (3*deg)];
    # raw v folds into the X_OFF rows, pre-scaled by 1/X_SCALE (exact).
    vsc = pack_sc(
        wv[width + 3: width + 3 + 3 * deg_view],
        wv[width + 3 + 3 * deg_view:], wv.shape[-1]
    )
    vsc = vsc.at[X_OFF: X_OFF + 3].set(
        (wv[width: width + 3] * (1.0 / X_SCALE)).astype(cd)
    )
    ops += [
        wd.astype(cd), jnp.asarray(bd, jnp.float32).reshape(1, -1),
        wb.astype(cd), jnp.asarray(bb, jnp.float32).reshape(1, -1),
        vh, vsc, jnp.asarray(bv, jnp.float32).reshape(1, -1),
        wr.astype(cd), jnp.asarray(br, jnp.float32).reshape(1, -1),
    ]
    return ops


def _safe_sin(x):
    return jnp.sin(jnp.where(jnp.abs(x) < _SAFE_T, x, x % _SAFE_T))


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b, cd):
    return jax.lax.dot_general(
        a, b.astype(cd), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _op_index(net_depth, skip_layer):
    """Static walk of the operand list -> named index maps."""
    it = iter(range(10**6))
    idx = dict(F=next(it), F2=next(it), Fv=next(it))
    post_skip = {i for i in range(1, net_depth)
                 if (i - 1) % skip_layer == 0 and (i - 1) > 0}
    layers = []
    for i in range(net_depth):
        d = {}
        if i == 0:
            d["wsc"] = next(it)
        elif i in post_skip:
            d["wh"], d["wsc"] = next(it), next(it)
        else:
            d["wh"] = next(it)
        d["b"] = next(it)
        layers.append(d)
    for k in ("wd", "bd", "wb", "bb", "wvh", "wvsc", "bv", "wr", "br"):
        idx[k] = next(it)
    return idx, layers, post_skip


def _dot0(a, b):
    """[3, T] x [3, C] contracted over dim 0 -> [T, C] fp32 (the same
    dim0-dim0 form as the weight-grad matmuls, full-rate on the MXU)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mip_aligned_forward(means, covs, views, ops, *, net_depth, skip_layer,
                         compute_dtype, transposed=False):
    """Forward on aligned operands. Returns (raw out, residuals).

    transposed=True: means/covs/views arrive [3, T] and the output is
    [4, T] — the [N, 3]/[N, 4] orientations pad 3-4 lanes to 128 in HBM
    (~42x traffic on every producer/consumer); [3, N] pads sublanes
    only. Activations stay row-major [T, C] internally either way."""
    cd = compute_dtype
    idx, layers, _ = _op_index(net_depth, skip_layer)
    F, F2, Fv = ops[idx["F"]], ops[idx["F2"]], ops[idx["Fv"]]

    m32 = means.astype(jnp.float32)
    c32 = covs.astype(jnp.float32)
    dot_in = _dot0 if transposed else _dot
    p = dot_in(m32, F)
    damp = jnp.exp(-0.5 * dot_in(c32, F2))
    sc = (damp * _safe_sin(p + _phase_bias())).astype(cd)

    acts = []
    h = None
    for i, d in enumerate(layers):
        pre = _dot(sc, ops[d["wsc"]]) if "wsc" in d else 0.0
        if "wh" in d:
            pre = pre + _dot(h, ops[d["wh"]])
        h = jnp.maximum(pre + ops[d["b"]], 0.0).astype(cd)
        acts.append(h)

    bneck = (_dot(h, ops[idx["wb"]]) + ops[idx["bb"]]).astype(cd)

    v32 = views.astype(jnp.float32)
    vsc = _safe_sin(dot_in(v32, Fv) + _phase_bias()).astype(cd)
    hv = jnp.maximum(
        _dot(bneck, ops[idx["wvh"]]) + _dot(vsc, ops[idx["wvsc"]])
        + ops[idx["bv"]],
        0.0,
    ).astype(cd)
    if transposed:
        # Emit [3, T]/[1, T] straight off the MXU ((0,)x(1,)
        # contractions) instead of transposing a [T, 4] concat per tile.
        rgb_T = jax.lax.dot_general(
            ops[idx["wr"]], hv,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ops[idx["br"]].T
        dens_T = jax.lax.dot_general(
            ops[idx["wd"]], h,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ops[idx["bd"]].T
        out = jnp.concatenate([rgb_T, dens_T], axis=0)
    else:
        density = _dot(h, ops[idx["wd"]]) + ops[idx["bd"]]
        rgb = _dot(hv, ops[idx["wr"]]) + ops[idx["br"]]
        out = jnp.concatenate([rgb, density], axis=-1)
    res = dict(sc=sc, vsc=vsc, acts=acts, bneck=bneck, hv=hv,
               p=p, damp=damp)
    return out, res


def _safe_cos(x):
    """Derivative of _safe_sin: cos of the same range-reduced argument."""
    return jnp.cos(jnp.where(jnp.abs(x) < _SAFE_T, x, x % _SAFE_T))


def _mip_density_dmeans(res, ops, *, net_depth, skip_layer, compute_dtype):
    """d(raw_density)/d(means) per point, [3, T], from forward residuals.

    The analytic dx walk the normals need (`models/mlp.py:128-148`, ref
    `RegNeRF/internal/models.py:244-262`): density-head cotangent back
    through the relu trunk, accumulated into the packed-PE register
    wherever a layer consumed it, then through the PE's closed-form
    Jacobian d sc/d means = damp * cos(p + B) * F. Trunk-only (~1x
    forward-FLOPs of the trunk); the view branch never feeds density.
    """
    cd = compute_dtype
    idx, layers, _ = _op_index(net_depth, skip_layer)
    wd = ops[idx["wd"]]  # [W, 1]
    t = res["acts"][-1].shape[0]
    g_h = jnp.broadcast_to(
        wd.astype(jnp.float32).T, (t, wd.shape[0])
    )
    g_sc = jnp.zeros_like(res["p"])
    for i in reversed(range(net_depth)):
        d = layers[i]
        g_pre = g_h * (res["acts"][i].astype(jnp.float32) > 0)
        g_pre_c = g_pre.astype(cd)
        if "wsc" in d:
            g_sc = g_sc + _dot(g_pre_c, ops[d["wsc"]].T)
        if i > 0:
            g_h = _dot(g_pre_c, ops[d["wh"]].T) if "wh" in d else \
                jnp.zeros_like(g_h)
    g_p = g_sc * res["damp"] * _safe_cos(res["p"] + _phase_bias())
    return jax.lax.dot_general(
        ops[idx["F"]], g_p.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mip_aligned_backward(g, means, covs, views, ops, *, net_depth,
                          skip_layer, compute_dtype, transposed=False):
    """Recompute forward; return grads for the aligned operand list
    (None for the F/F2/Fv constants). transposed=True: means/covs/views
    are [3, T] and g is [4, T]."""
    _, r = _mip_aligned_forward(
        means, covs, views, ops, net_depth=net_depth,
        skip_layer=skip_layer, compute_dtype=compute_dtype,
        transposed=transposed,
    )
    return _mip_aligned_backward_from_res(
        g, r, ops, net_depth=net_depth, skip_layer=skip_layer,
        compute_dtype=compute_dtype, transposed=transposed,
    )


def _mip_aligned_backward_from_res(g, r, ops, *, net_depth, skip_layer,
                                   compute_dtype, transposed=False):
    """Backward walk on saved forward residuals `r` (the one-pass
    megakernel keeps them VMEM-resident instead of recomputing)."""
    cd = compute_dtype
    idx, layers, _ = _op_index(net_depth, skip_layer)
    grads = [None] * len(ops)

    def relu_mask(a):
        return a.astype(jnp.float32) > 0

    if transposed:
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
        g_dens_T = g[3:4]
        grads[idx["wr"]] = dot_gT(r["hv"], g_rgb_T)
        grads[idx["br"]] = jnp.sum(g_rgb_T, axis=1)[None, :]
        g_hv = gT_dot(g_rgb_T, ops[idx["wr"]]) * relu_mask(r["hv"])
    else:
        g_rgb = g[:, :3]
        grads[idx["wr"]] = _dot_t(r["hv"], g_rgb, cd)
        grads[idx["br"]] = jnp.sum(g_rgb, axis=0, keepdims=True)
        g_hv = _dot(g_rgb.astype(cd), ops[idx["wr"]].T) * relu_mask(
            r["hv"]
        )
    g_hv_c = g_hv.astype(cd)
    grads[idx["wvh"]] = _dot_t(r["bneck"], g_hv, cd)
    grads[idx["wvsc"]] = _dot_t(r["vsc"], g_hv, cd)
    grads[idx["bv"]] = jnp.sum(g_hv, axis=0, keepdims=True)

    # bottleneck has no activation (models/mlp.py:154).
    g_bneck = _dot(g_hv_c, ops[idx["wvh"]].T)
    h_last = r["acts"][-1]
    grads[idx["wb"]] = _dot_t(h_last, g_bneck, cd)
    grads[idx["bb"]] = jnp.sum(g_bneck, axis=0, keepdims=True)
    if transposed:
        grads[idx["wd"]] = dot_gT(h_last, g_dens_T)
        grads[idx["bd"]] = jnp.sum(g_dens_T, axis=1)[None, :]
        g_h = _dot(g_bneck.astype(cd), ops[idx["wb"]].T) + gT_dot(
            g_dens_T, ops[idx["wd"]]
        )
    else:
        g_dens = g[:, 3:4]
        grads[idx["wd"]] = _dot_t(h_last, g_dens, cd)
        grads[idx["bd"]] = jnp.sum(g_dens, axis=0, keepdims=True)
        g_h = (_dot(g_bneck.astype(cd), ops[idx["wb"]].T)
               + _dot(g_dens.astype(cd), ops[idx["wd"]].T))
    for i in reversed(range(net_depth)):
        d = layers[i]
        g_pre = g_h * relu_mask(r["acts"][i])
        g_pre_c = g_pre.astype(cd)
        if "wh" in d:
            grads[d["wh"]] = _dot_t(r["acts"][i - 1], g_pre, cd)
        if "wsc" in d:
            grads[d["wsc"]] = _dot_t(r["sc"], g_pre, cd)
        grads[d["b"]] = jnp.sum(g_pre, axis=0, keepdims=True)
        if i > 0:
            g_h = _dot(g_pre_c, ops[d["wh"]].T) if "wh" in d else \
                jnp.zeros_like(g_h)
    return grads


def _recombine_mip_grads(ag, weights, net_depth, skip_layer, num_freqs,
                         deg_view):
    """Aligned grad list -> flax-layout grad list (w/b alternating)."""
    idx, layers, _ = _op_index(net_depth, skip_layer)
    pe_rows = 3 * num_freqs
    out = []
    for i, d in enumerate(layers):
        w = weights[2 * i]
        if "wsc" in d and "wh" in d:
            trunk_rows = w.shape[0] - 2 * pe_rows
            dw = jnp.zeros(w.shape, jnp.float32)
            dw = dw.at[:trunk_rows].set(ag[d["wh"]])
            dw = dw.at[trunk_rows: trunk_rows + pe_rows].set(
                ag[d["wsc"]][:pe_rows]
            )
            dw = dw.at[trunk_rows + pe_rows:].set(
                ag[d["wsc"]][COS_OFF: COS_OFF + pe_rows]
            )
        elif "wsc" in d:
            dw = jnp.concatenate(
                [ag[d["wsc"]][:pe_rows],
                 ag[d["wsc"]][COS_OFF: COS_OFF + pe_rows]], axis=0
            )
        else:
            dw = ag[d["wh"]]
        out += [dw, ag[d["b"]].reshape(weights[2 * i + 1].shape)]
    wv = weights[2 * net_depth + 4]
    width = weights[2 * net_depth + 2].shape[-1]
    dvsc = ag[idx["wvsc"]]
    dv = jnp.zeros(wv.shape, jnp.float32)
    dv = dv.at[:width].set(ag[idx["wvh"]])
    # d/dw_torch = d/dw_kernel * (1/X_SCALE) for the pre-scaled v rows.
    dv = dv.at[width: width + 3].set(
        dvsc[X_OFF: X_OFF + 3] * (1.0 / X_SCALE)
    )
    dv = dv.at[width + 3: width + 3 + 3 * deg_view].set(
        dvsc[: 3 * deg_view]
    )
    dv = dv.at[width + 3 + 3 * deg_view:].set(
        dvsc[COS_OFF: COS_OFF + 3 * deg_view]
    )
    out += [ag[idx["wd"]], ag[idx["bd"]].reshape(weights[2 * net_depth + 1].shape)]
    out += [ag[idx["wb"]], ag[idx["bb"]].reshape(weights[2 * net_depth + 3].shape)]
    out += [dv, ag[idx["bv"]].reshape(weights[2 * net_depth + 5].shape)]
    out += [ag[idx["wr"]], ag[idx["br"]].reshape(weights[2 * net_depth + 7].shape)]
    return out


def _pad_rows(x, n):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)


def _whole(w):
    return pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _tile_spec(tile, lanes):
    return pl.BlockSpec((tile, lanes), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _fwd_pallas(weights, means, covs, views, net_depth, skip_layer,
                num_freqs, deg_view, tile, interpret, compute_dtype,
                out_lanes: int = 128):
    interpret = fm.auto_interpret(interpret)
    ops = prepare_mip_aligned(weights, net_depth, skip_layer, num_freqs,
                              deg_view, compute_dtype)
    n = means.shape[0]
    n_pad = -(-n // tile) * tile
    args = [_pad_rows(x, n_pad) for x in (means, covs, views)]
    grid = (n_pad // tile,)

    def kernel(m_ref, c_ref, v_ref, *refs):
        *op_refs, out_ref = refs
        vals = [r[:] for r in op_refs]
        out, _ = _mip_aligned_forward(
            m_ref[:], c_ref[:], v_ref[:], vals, net_depth=net_depth,
            skip_layer=skip_layer, compute_dtype=compute_dtype,
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
        in_specs=[_tile_spec(tile, 3)] * 3 + [_whole(w) for w in ops],
        out_specs=_tile_spec(tile, out_lanes),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*args, *ops)
    return out[:n, :4]


def _bwd_pallas(weights, means, covs, views, g, net_depth, skip_layer,
                num_freqs, deg_view, tile, interpret, compute_dtype):
    interpret = fm.auto_interpret(interpret)
    ops = prepare_mip_aligned(weights, net_depth, skip_layer, num_freqs,
                              deg_view, compute_dtype)
    n = means.shape[0]
    n_pad = -(-n // tile) * tile
    args = [_pad_rows(x, n_pad) for x in (means, covs, views)]
    g_p = _pad_rows(g, n_pad)
    grid = (n_pad // tile,)
    trainable = list(range(3, len(ops)))  # all but F/F2/Fv

    def kernel(m_ref, c_ref, v_ref, g_ref, *refs):
        op_refs = refs[: len(ops)]
        out_refs = refs[len(ops): len(ops) + len(trainable)]
        acc_refs = refs[len(ops) + len(trainable):]
        vals = [r[:] for r in op_refs]
        tile_grads = _mip_aligned_backward(
            g_ref[:], m_ref[:], c_ref[:], v_ref[:], vals,
            net_depth=net_depth, skip_layer=skip_layer,
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
        in_specs=[_tile_spec(tile, 3)] * 3 + [_tile_spec(tile, 4)]
        + [_whole(w) for w in ops],
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
    )(*args, g_p, *ops)

    aligned_grads = [None, None, None] + list(grads)
    return _recombine_mip_grads(aligned_grads, weights, net_depth,
                                skip_layer, num_freqs, deg_view)


def _pad_cols(x, n):
    pad = n - x.shape[1]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.zeros((x.shape[0], pad), x.dtype)], 1)


def _fwd_pallas_T(weights, means_T, covs_T, views_T, net_depth, skip_layer,
                  num_freqs, deg_view, tile, interpret, compute_dtype,
                  with_normals=False):
    """Transposed-stream forward: means/covs/views [3, N] -> raw [4, N].

    with_normals appends d(raw_density)/d(means) as rows 4:7 (the
    normals' analytic dx walk, computed in-kernel on the still-resident
    activations) -> [7, N]."""
    interpret = fm.auto_interpret(interpret)
    if not interpret:
        # Mosaic requires the lane (last) block dim be a multiple of 128.
        tile = max(128, -(-tile // 128) * 128)
    ops = prepare_mip_aligned(weights, net_depth, skip_layer, num_freqs,
                              deg_view, compute_dtype)
    n = means_T.shape[1]
    n_pad = -(-n // tile) * tile
    args = [_pad_cols(x, n_pad) for x in (means_T, covs_T, views_T)]
    grid = (n_pad // tile,)
    out_rows = 7 if with_normals else 4

    def kernel(m_ref, c_ref, v_ref, *refs):
        *op_refs, out_ref = refs
        vals = [r[:] for r in op_refs]
        out, r = _mip_aligned_forward(
            m_ref[:], c_ref[:], v_ref[:], vals, net_depth=net_depth,
            skip_layer=skip_layer, compute_dtype=compute_dtype,
            transposed=True,
        )
        if with_normals:
            dmeans = _mip_density_dmeans(
                r, vals, net_depth=net_depth, skip_layer=skip_layer,
                compute_dtype=compute_dtype,
            )
            out = jnp.concatenate([out, dmeans], axis=0)
        out_ref[:] = out

    def _tspec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_tspec(3)] * 3 + [_whole(w) for w in ops],
        out_specs=_tspec(out_rows),
        out_shape=jax.ShapeDtypeStruct((out_rows, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FWD_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*args, *ops)
    return out[:, :n]


def _bwd_pallas_T(weights, means_T, covs_T, views_T, g_T, net_depth,
                  skip_layer, num_freqs, deg_view, tile, interpret,
                  compute_dtype):
    interpret = fm.auto_interpret(interpret)
    if not interpret:
        # Mosaic requires the lane (last) block dim be a multiple of 128.
        tile = max(128, -(-tile // 128) * 128)
    ops = prepare_mip_aligned(weights, net_depth, skip_layer, num_freqs,
                              deg_view, compute_dtype)
    n = means_T.shape[1]
    n_pad = -(-n // tile) * tile
    args = [_pad_cols(x, n_pad) for x in (means_T, covs_T, views_T)]
    g_p = _pad_cols(g_T, n_pad)
    grid = (n_pad // tile,)
    trainable = list(range(3, len(ops)))

    def kernel(m_ref, c_ref, v_ref, g_ref, *refs):
        op_refs = refs[: len(ops)]
        out_refs = refs[len(ops): len(ops) + len(trainable)]
        acc_refs = refs[len(ops) + len(trainable):]
        vals = [r[:] for r in op_refs]
        tile_grads = _mip_aligned_backward(
            g_ref[:], m_ref[:], c_ref[:], v_ref[:], vals,
            net_depth=net_depth, skip_layer=skip_layer,
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

    def _tspec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    grads = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_tspec(3)] * 3 + [_tspec(4)] + [_whole(w) for w in ops],
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
    )(*args, g_p, *ops)

    aligned_grads = [None, None, None] + list(grads)
    return _recombine_mip_grads(aligned_grads, weights, net_depth,
                                skip_layer, num_freqs, deg_view)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(4, 5, 6, 7, 8, 9, 10),
)
def fused_mip_mlp_train_T(
    weights: Sequence[jnp.ndarray],
    means_T: jnp.ndarray,
    covs_T: jnp.ndarray,
    views_T: jnp.ndarray,
    net_depth: int = 8,
    skip_layer: int = 4,
    num_freqs: int = 16,
    deg_view: int = 4,
    tile: int = TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
):
    """Transposed-stream differentiable fused MipMLP: means/covs/views
    [3, N] in, raw [4, N] out. Same math as fused_mip_mlp_train; the
    [N, 3/4] orientation pads to 128 lanes in HBM (~42x traffic)."""
    return _fwd_pallas_T(weights, means_T, covs_T, views_T, net_depth,
                         skip_layer, num_freqs, deg_view, tile, interpret,
                         compute_dtype)


def _vjp_fwd_T(weights, means_T, covs_T, views_T, net_depth, skip_layer,
               num_freqs, deg_view, tile, interpret, compute_dtype):
    out = _fwd_pallas_T(weights, means_T, covs_T, views_T, net_depth,
                        skip_layer, num_freqs, deg_view, tile, interpret,
                        compute_dtype)
    return out, (weights, means_T, covs_T, views_T)


def _vjp_bwd_T(net_depth, skip_layer, num_freqs, deg_view, tile, interpret,
               compute_dtype, residuals, g):
    weights, means_T, covs_T, views_T = residuals
    d_weights = _bwd_pallas_T(
        weights, means_T, covs_T, views_T, g, net_depth, skip_layer,
        num_freqs, deg_view, tile, interpret, compute_dtype,
    )
    return (tuple(d_weights), jnp.zeros_like(means_T),
            jnp.zeros_like(covs_T), jnp.zeros_like(views_T))


fused_mip_mlp_train_T.defvjp(_vjp_fwd_T, _vjp_bwd_T)


def fused_mip_mlp_normals_T(
    weights: Sequence[jnp.ndarray],
    means_T: jnp.ndarray,
    covs_T: jnp.ndarray,
    views_T: jnp.ndarray,
    net_depth: int = 8,
    skip_layer: int = 4,
    num_freqs: int = 16,
    deg_view: int = 4,
    tile: int = TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
):
    """Forward with in-kernel normals: [7, N] = [rgb_raw(3),
    density_raw(1), d(raw_density)/d(means)(3)].

    Not differentiable (no VJP rule) — the render/eval path for
    disable_normals=False configs; normals feed no reference loss
    (RegNeRF/train.py:97-241)."""
    return _fwd_pallas_T(weights, means_T, covs_T, views_T, net_depth,
                         skip_layer, num_freqs, deg_view, tile, interpret,
                         compute_dtype, with_normals=True)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(4, 5, 6, 7, 8, 9, 10),
)
def fused_mip_mlp_train(
    weights: Sequence[jnp.ndarray],
    means: jnp.ndarray,
    covs: jnp.ndarray,
    views: jnp.ndarray,
    net_depth: int = 8,
    skip_layer: int = 4,
    num_freqs: int = 16,
    deg_view: int = 4,
    tile: int = TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
):
    """Differentiable aligned fused MipMLP.

    weights: flat flax-layout list (flatten_mip_params order). means/covs:
    [N, 3] Gaussian means and diagonal covariances; views: [N, 3] raw
    viewdirs. Returns [N, 4] = [rgb_raw, density_raw]; weight grads only.
    """
    return _fwd_pallas(weights, means, covs, views, net_depth, skip_layer,
                       num_freqs, deg_view, tile, interpret, compute_dtype)


def _vjp_fwd(weights, means, covs, views, net_depth, skip_layer, num_freqs,
             deg_view, tile, interpret, compute_dtype):
    out = _fwd_pallas(weights, means, covs, views, net_depth, skip_layer,
                      num_freqs, deg_view, tile, interpret, compute_dtype)
    return out, (weights, means, covs, views)


def _vjp_bwd(net_depth, skip_layer, num_freqs, deg_view, tile, interpret,
             compute_dtype, residuals, g):
    weights, means, covs, views = residuals
    d_weights = _bwd_pallas(
        weights, means, covs, views, g, net_depth, skip_layer, num_freqs,
        deg_view, tile, interpret, compute_dtype,
    )
    return (tuple(d_weights), jnp.zeros_like(means), jnp.zeros_like(covs),
            jnp.zeros_like(views))


fused_mip_mlp_train.defvjp(_vjp_fwd, _vjp_bwd)


def reference_mip_mlp_apply(weights, means, covs, views, *, net_depth=8,
                            skip_layer=4, num_freqs=16, deg_view=4,
                            compute_dtype=jnp.float32):
    """Pure-XLA oracle on the same aligned math (no Pallas)."""
    ops = prepare_mip_aligned(weights, net_depth, skip_layer, num_freqs,
                              deg_view, compute_dtype)
    out, _ = _mip_aligned_forward(
        means, covs, views, ops, net_depth=net_depth,
        skip_layer=skip_layer, compute_dtype=compute_dtype,
    )
    return out
