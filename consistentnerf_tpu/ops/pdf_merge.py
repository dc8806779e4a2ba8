"""Fused hierarchical-resampling kernel: inverse-CDF fine sampling + the
coarse/fine z merge in ONE pallas call.

The vanilla fine level (`run_nerf_view.py:512-529`: `sample_pdf` over the
coarse compositing weights, then `sort(cat([z_coarse, z_samples]))`)
costs ~2-3 ms of XLA glue per train step between the two MLP megakernels
(gather-free sample_pdf ~2 ms + the [N, S_c+S_i] sort). This kernel does
both on a ray-major 2D layout (rays in sublanes, samples in lanes):

* the CDF is a 7-step log-roll prefix sum over the lane axis;
* searchsorted becomes a static 63-interval masked-accumulate loop —
  numerically identical to `core.sampling.sample_pdf`'s masked max/min
  reductions (both select the same below/above entries because cdf and
  bins are sorted);
* the merge exploits sortedness: the draws `u` must be ascending, so the
  fine samples come out ascending (inverse CDF is monotone), and
  `sort(concat(z_c, z_s))` reduces to ONE bitonic merge (8 compare-
  exchange stages over 256 lanes) instead of a full sort.

Ascending draws are exact semantics, not an approximation: the reference
draws iid U[0,1] and sorts the concatenated result, so any per-ray
reordering of the draws yields the identical final z vector in
distribution; `sorted_uniform` below generates the order statistics
directly (normalized exponential spacings) with no sort anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from consistentnerf_tpu.ops import fused_mlp as fm

_BIG = 1e38  # finite +/- sentinel (inf-inf NaNs avoided)


def sorted_uniform(rng, shape) -> jnp.ndarray:
    """Ascending iid-U[0,1) order statistics along the last axis without a
    sort: u_(i) = S_i / S_{n+1} with S the prefix sums of Exp(1) spacings
    (Renyi representation). Distributionally identical to
    `sort(uniform(shape))`."""
    n = shape[-1]
    e = -jnp.log1p(-jax.random.uniform(rng, shape[:-1] + (n + 1,)))
    s = jnp.cumsum(e, axis=-1)
    return s[..., :-1] / s[..., -1:]


def _row_prefix_excl(x, width):
    """Exclusive prefix sum along lanes of a [R, L] tile (first `width`
    lanes meaningful)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    k = 1
    while k < width:
        acc = acc + jnp.where(lane >= k, jnp.roll(acc, k, axis=-1), 0.0)
        k *= 2
    excl = jnp.roll(acc, 1, axis=-1)
    return jnp.where(lane >= 1, excl, 0.0)


def _lane_reverse(x, width):
    """Reverse the first `width` (power of two) lanes of every row via
    XOR-distance butterflies (reversal = lane ^ (width-1))."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = width // 2
    while k >= 1:
        upper = (lane // k) % 2 == 1
        x = jnp.where(upper, jnp.roll(x, k, axis=-1),
                      jnp.roll(x, -k, axis=-1))
        k //= 2
    return x


def _bitonic_merge_asc(x, width):
    """Ascending bitonic merge of a [R, width] bitonic row (width a power
    of two): log2(width) compare-exchange stages, partners at XOR
    distance k fetched with two rolls."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = width // 2
    while k >= 1:
        upper = (lane // k) % 2 == 1
        partner = jnp.where(upper, jnp.roll(x, k, axis=-1),
                            jnp.roll(x, -k, axis=-1))
        x = jnp.where(upper, jnp.maximum(x, partner),
                      jnp.minimum(x, partner))
        k //= 2
    return x


def _pdf_merge_kernel(z_ref, w_ref, u_ref, o_ref, zs_ref, *, s_c, s_i):
    zc = z_ref[:]          # [R, 128]; lanes >= s_c are padding
    w = w_ref[:]           # [R, 128]; lanes >= s_c-2 are zero
    u = u_ref[:]           # [R, 128]; ascending draws
    lane = jax.lax.broadcasted_iota(jnp.int32, zc.shape, 1)
    m = s_c - 1            # number of bins (cdf/bins entries)

    # bins = midpoints of the coarse z (z_mid, run_nerf_view.py:512)
    mids = 0.5 * (zc + jnp.roll(zc, -1, axis=-1))  # lanes 0..s_c-2 valid

    # weights + 1e-5, normalized — formula order matches
    # core.sampling.sample_pdf exactly (pdf first, then the prefix sum).
    wv = jnp.where(lane < m - 1, w + 1e-5, 0.0)
    pdf = wv / jnp.sum(wv, axis=-1, keepdims=True)
    # cdf_k = sum_{i<k} pdf_i for k = 0..m-1 (the concat-zero exclusive
    # prefix of sampling.sample_pdf).
    cdf = _row_prefix_excl(pdf, m)

    # searchsorted(right) + linear interp as a static interval loop:
    # interval k owns u in [cdf_k, cdf_{k+1}) (last interval: u >= cdf_k),
    # which selects the same below/above entries as the masked max/min
    # reductions in sampling.sample_pdf (both sides sorted).
    cdf0 = jnp.zeros_like(u)
    cdf1 = jnp.zeros_like(u)
    b0 = jnp.zeros_like(u)
    b1 = jnp.zeros_like(u)
    # NOTE: lane extraction must be a STATIC slice (k is a Python int):
    # lax.dynamic_slice lowers to the dynamic_slice primitive, which
    # real Mosaic does not implement (slice_p it does).
    for k in range(m):
        ck = cdf[:, k:k + 1]
        bk = mids[:, k:k + 1]
        if k + 1 < m:
            ck1 = cdf[:, k + 1:k + 2]
            bk1 = mids[:, k + 1:k + 2]
            mk = (u >= ck) & (u < ck1)
        else:
            ck1, bk1 = ck, bk  # right edge: above clamps to the last entry
            mk = u >= ck
        mkf = mk.astype(u.dtype)
        cdf0 += mkf * ck
        cdf1 += mkf * ck1
        b0 += mkf * bk
        b1 += mkf * bk1
    denom = cdf1 - cdf0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    z_s = b0 + (u - cdf0) / denom * (b1 - b0)  # ascending (u ascending)
    zs_ref[:] = z_s[:, : zs_ref.shape[-1]]

    # sort(concat(z_c, z_s)) as one bitonic merge. The 256-lane row
    # [-BIG x (128-s_c) | z_c asc | +BIG x (128-s_i) reversed-in | z_s
    # desc] is nondecreasing then nonincreasing (bitonic): -BIG pads lead,
    # +BIG pads sit at the peak, so after the ascending merge the real
    # s_c+s_i values occupy lanes [128-s_c, 128+s_i).
    part1 = jnp.where(lane < 128 - s_c, -_BIG,
                      jnp.roll(zc, 128 - s_c, axis=-1))
    part2 = _lane_reverse(jnp.where(lane < s_i, z_s, _BIG), 128)
    merged = _bitonic_merge_asc(
        jnp.concatenate([part1, part2], axis=-1), 256
    )
    o_ref[:] = merged[:, 128 - s_c:128 - s_c + o_ref.shape[-1]]


def sample_pdf_merged(
    z_c: jnp.ndarray,   # [N, S_c] ascending coarse depths
    w: jnp.ndarray,     # [N, S_c - 2] interior compositing weights
    u: jnp.ndarray,     # [N, S_i] ASCENDING draws in [0, 1]
    *,
    block_rows: int = 256,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused equivalent of
    `sort(concat(z_c, sample_pdf(z_mid(z_c), w, S_i, u)))` (the vanilla
    fine-level glue, run_nerf_view.py:512-529). Requires ascending `u`
    (deterministic linspace draws are; use `sorted_uniform` for the
    stochastic path) and S_c, S_i <= 128. Returns (z_merged [N, S_c+S_i],
    z_samples [N, S_i]) — the raw importance samples feed diagnostics
    like z_std where moment subtraction would cancel.
    """
    n, s_c = z_c.shape
    s_i = u.shape[-1]
    assert w.shape == (n, s_c - 2), (w.shape, z_c.shape)
    assert s_c <= 128 and s_i <= 128, (s_c, s_i)
    interpret = fm.auto_interpret(interpret)

    r = min(block_rows, n)
    n_pad = -(-n // r) * r

    def pad_rows(x, lanes):
        out = jnp.zeros((n_pad, lanes), x.dtype)
        return out.at[:n, : x.shape[-1]].set(x)

    # Padding rows get a benign, strictly sorted problem (z_c pad rows are
    # all zero -> mids 0, weights 1e-5 uniform): outputs are dropped.
    zp = pad_rows(z_c.astype(jnp.float32), 128)
    wp = pad_rows(w.astype(jnp.float32), 128)
    up = pad_rows(u.astype(jnp.float32), 128)

    out, z_s = pl.pallas_call(
        functools.partial(_pdf_merge_kernel, s_c=s_c, s_i=s_i),
        grid=(n_pad // r,),
        in_specs=[
            pl.BlockSpec((r, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=(
            pl.BlockSpec((r, s_c + s_i), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, s_i), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, s_c + s_i), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, s_i), jnp.float32),
        ),
        interpret=interpret,
    )(zp, wp, up)
    return out[:n], z_s[:n]


def _mip_resample_kernel(t_ref, w_ref, u_ref, pad_ref, o_ref, *, s):
    """sorted_piecewise_constant_pdf + blurpool (core.sampling
    .resample_along_rays / RegNeRF math.py:169-234) on [R, lanes] tiles.
    t_ref: [R, 128] fenceposts (s+1 valid); w_ref: [R, 128] level-1
    weights (s valid); u_ref: [R, 128] ascending draws (s+1 valid);
    pad_ref: [1, 1] resample_padding scalar."""
    eps = jnp.float32(np.finfo(np.float32).eps)
    t = t_ref[:]
    w = w_ref[:]
    u = u_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)

    # blurpool (mip.py:349-360): 0.5*(max(w[i-1],w[i]) + max(w[i],w[i+1]))
    # with edge duplication.
    wm1 = jnp.where(lane == 0, w, jnp.roll(w, 1, axis=-1))
    wp1 = jnp.where(lane == s - 1, w, jnp.roll(w, -1, axis=-1))
    blur = 0.5 * (jnp.maximum(wm1, w) + jnp.maximum(w, wp1))
    wv = jnp.where(lane < s, blur + pad_ref[0, 0], 0.0)

    # per-row deficit pad added to every weight so sums reach eps
    # (math.py:176-180)
    wsum = jnp.sum(wv, axis=-1, keepdims=True)
    wv = jnp.where(lane < s, wv + jnp.maximum(0.0, eps - wsum), 0.0)
    pdf = wv / jnp.sum(wv, axis=-1, keepdims=True)

    # cdf = [0, min(1, cumsum(pdf[..., :-1])), 1]: s+1 entries
    lane_iota = lane
    incl = pdf
    k = 1
    while k < s:
        incl = incl + jnp.where(
            lane_iota >= k, jnp.roll(incl, k, axis=-1), 0.0
        )
        k *= 2
    cdf = jnp.minimum(1.0, jnp.roll(incl, 1, axis=-1))
    cdf = jnp.where(lane_iota == 0, 0.0, cdf)
    cdf = jnp.where(lane_iota == s, 1.0, cdf)

    # find_interval: below = last k with u >= cdf_k, above = first k with
    # cdf_k > u (math.py:191-199 masked max/min reductions) as a static
    # interval loop over the s+1 cdf entries.
    cdf0 = jnp.zeros_like(u)
    cdf1 = jnp.zeros_like(u)
    b0 = jnp.zeros_like(u)
    b1 = jnp.zeros_like(u)
    # static lane slices — see the dynamic_slice note in _pdf_merge_kernel
    for k in range(s + 1):
        ck = cdf[:, k:k + 1]
        bk = t[:, k:k + 1]
        if k < s:
            ck1 = cdf[:, k + 1:k + 2]
            bk1 = t[:, k + 1:k + 2]
            mk = (u >= ck) & (u < ck1)
        else:
            ck1, bk1 = ck, bk
            mk = u >= ck
        mkf = mk.astype(u.dtype)
        cdf0 += mkf * ck
        cdf1 += mkf * ck1
        b0 += mkf * bk
        b1 += mkf * bk1
    denom = cdf1 - cdf0
    # u < 1 and cdf ends at exactly 1, so a strictly-greater entry always
    # exists and denom > 0 on real rows; the guard mirrors the
    # reference's nan_to_num(0) for padded rows.
    tt = jnp.clip(jnp.where(denom > 0, (u - cdf0) / denom, 0.0), 0.0, 1.0)
    o_ref[:] = (b0 + tt * (b1 - b0))[:, : o_ref.shape[-1]]


def mip_resample_t_vals(
    t_vals: jnp.ndarray,   # [N, S+1] ascending fenceposts
    weights: jnp.ndarray,  # [N, S] level-1 compositing weights
    u: jnp.ndarray,        # [N, S+1] ASCENDING draws in [0, 1)
    resample_padding,      # scalar (traced ok)
    *,
    block_rows: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused equivalent of the mip level-2 resampler
    (`core.sampling.resample_along_rays` minus cast_rays): blurpool +
    padding + hardened inverse-CDF. The reference's draw vectors are
    already ascending (centered linspace / strided jitter,
    math.py:181-190), so passing the identical `u` preserves the exact
    RNG stream."""
    n, sp1 = t_vals.shape
    s = sp1 - 1
    assert weights.shape == (n, s), (weights.shape, t_vals.shape)
    assert sp1 <= 128, sp1
    interpret = fm.auto_interpret(interpret)

    r = min(block_rows, n)
    n_pad = -(-n // r) * r

    def pad_rows(x):
        out = jnp.zeros((n_pad, 128), jnp.float32)
        return out.at[:n, : x.shape[-1]].set(x.astype(jnp.float32))

    pad_arr = jnp.asarray(resample_padding,
                          jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        functools.partial(_mip_resample_kernel, s=s),
        grid=(n_pad // r,),
        in_specs=[
            pl.BlockSpec((r, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((r, sp1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, sp1), jnp.float32),
        interpret=interpret,
    )(pad_rows(t_vals), pad_rows(weights), pad_rows(u), pad_arr)
    return out[:n]


def fine_z_draws(rng, n, s_i, det: bool) -> jnp.ndarray:
    """The draw vector for `sample_pdf_merged`: the deterministic path's
    linspace (already ascending, bit-identical to sampling.sample_pdf's
    det branch) or ascending order statistics of iid U[0,1)."""
    if det:
        return jnp.broadcast_to(jnp.linspace(0.0, 1.0, s_i), (n, s_i))
    return sorted_uniform(rng, (n, s_i))


def fine_z_vals(
    z_vals: jnp.ndarray,    # [N, S_c] ascending coarse depths
    weights: jnp.ndarray,   # [N, S_c] compositing weights (full row)
    n_importance: int,
    rng=None,
    det: bool = True,
    use_kernel: bool = True,
    mesh=None,
    interpret: bool | None = None,
    return_samples: bool = False,
):
    """Drop-in for the vanilla fine-level resampling chain
    `sort(concat(z_vals, stop_grad(sample_pdf(z_mid, w[...,1:-1], S_i))))`
    (run_nerf_view.py:512-529). With `use_kernel` (and kernel-supported
    shapes) the whole chain runs in the fused pallas kernel; the output is
    stop-gradient in both modes (z_vals never depends on parameters in
    these callers, and the reference stop-grads the resampled points).
    `mesh`: shard_map the kernel over the data axis on multi-device
    meshes (tpu_custom_call operands must not be replicated).
    `return_samples`: also return the raw importance samples [N, S_i]
    (for diagnostics like z_std)."""
    if use_kernel and z_vals.ndim == 2 and z_vals.shape[-1] <= 128 \
            and n_importance <= 128:
        u = fine_z_draws(rng, z_vals.shape[0], n_importance, det)
        z_in = jax.lax.stop_gradient(z_vals)
        w_in = jax.lax.stop_gradient(weights[..., 1:-1])
        call = functools.partial(sample_pdf_merged, interpret=interpret)
        if mesh is not None and mesh.size > 1:
            from jax.sharding import PartitionSpec as P

            data = P("data", None)
            call = jax.shard_map(
                call, mesh=mesh, in_specs=(data, data, data),
                out_specs=(data, data), check_vma=False,
            )
        z_all, z_samples = jax.lax.stop_gradient(call(z_in, w_in, u))
    else:
        from consistentnerf_tpu.core import sampling

        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sampling.sample_pdf(
            z_mid, weights[..., 1:-1], n_importance, rng=rng, det=det
        )
        z_samples = jax.lax.stop_gradient(z_samples)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
    if return_samples:
        return z_all, z_samples
    return z_all
