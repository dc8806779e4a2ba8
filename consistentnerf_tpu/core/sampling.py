"""Along-ray sampling: stratified, hierarchical inverse-CDF, blurpool resample.

Two inverse-CDF samplers are provided:

* `sample_pdf` — semantics of the vanilla trainer's sampler
  (`run_nerf_helpers.py:206-250`): weights+1e-5, searchsorted(right) on the
  CDF, linear interp with denom clamping. Implemented with a TPU-friendly
  O(bins*samples) comparison mask instead of searchsorted's sequential scan.
* `sorted_piecewise_constant_pdf` — the numerically hardened RegNeRF sampler
  (`RegNeRF/internal/math.py:169-234`), preferred for new configs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from consistentnerf_tpu.core import mip as mip_core
from consistentnerf_tpu.core import spacing as spacing_core


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    u: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    det: bool = False,
) -> jnp.ndarray:
    """Hierarchical sampling with vanilla-NeRF semantics.

    bins: [..., M] sorted midpoints; weights: [..., M-1]. Returns
    [..., num_samples]. Pass `u` explicitly for deterministic tests.
    """
    weights = weights + 1e-5  # prevent nans
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [..., M]

    if u is None:
        u_shape = list(cdf.shape[:-1]) + [num_samples]
        if det:
            u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, num_samples), u_shape)
        else:
            u = jax.random.uniform(rng, u_shape)

    # torch.searchsorted(cdf, u, right=True) picks below = max{k: cdf[k]<=u}
    # and above = below+1 (clamped). Instead of gathering at those indices
    # (take_along_axis lowers to the TPU gather unit: measured 50 ms for
    # this shape vs 2 ms for the reduction form, tools/pdf_micro.py), use
    # masked max/min reductions over the O(M*S) compare mask — valid
    # because cdf and bins are both sorted ascending, so the masked max IS
    # the element at the last true index. cdf[0]=0 <= u always, so the
    # where-fallbacks only engage for `above` past the right edge,
    # matching the searchsorted clamp.
    mask = cdf[..., :, None] <= u[..., None, :]  # [..., M, S]

    def below_above(x):
        x0 = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), -2)
        x1 = jnp.min(jnp.where(~mask, x[..., None], x[..., -1:, None]), -2)
        return x0, x1

    cdf_g0, cdf_g1 = below_above(cdf)
    bins_g0, bins_g1 = below_above(bins)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def piecewise_pdf_draws(rng, batch_shape, num_samples, single_jitter):
    """The draw vector of `sorted_piecewise_constant_pdf`
    (RegNeRF math.py:181-190): centered linspace (rng=None) or strided
    jitter. Ascending by construction — shared by the XLA sampler and
    the fused resampling kernel so the two paths consume the identical
    RNG stream."""
    eps = jnp.finfo("float32").eps
    if rng is None:
        u = jnp.linspace(0.0, 1.0 - eps, num_samples)
        return jnp.broadcast_to(u, list(batch_shape) + [num_samples])
    s = 1 / num_samples
    u = jnp.arange(num_samples) * s
    d = 1 if single_jitter else num_samples
    u = u + jax.random.uniform(
        rng, list(batch_shape) + [d], maxval=s - eps
    )
    u = jnp.minimum(u, 1.0 - eps)
    return jnp.broadcast_to(u, list(batch_shape) + [num_samples])


def sorted_piecewise_constant_pdf(
    rng: Optional[jax.Array],
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    single_jitter: bool = False,
) -> jnp.ndarray:
    """Numerically hardened inverse-CDF sampler (RegNeRF math.py:169-234)."""
    eps = jnp.finfo("float32").eps

    # Pad every weight by the per-vector deficit so sums reach eps (no-op
    # when the weights are already non-degenerate).
    weights = weights + jnp.maximum(
        0, eps - jnp.sum(weights, axis=-1, keepdims=True)
    )
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)

    pdf = weights / weight_sum
    cdf = jnp.minimum(1, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [
            jnp.zeros(list(cdf.shape[:-1]) + [1]),
            cdf,
            jnp.ones(list(cdf.shape[:-1]) + [1]),
        ],
        axis=-1,
    )

    u = piecewise_pdf_draws(
        rng, list(cdf.shape[:-1]), num_samples, single_jitter
    )

    # The final True index in `mask` is the start of the sampled interval.
    mask = u[..., None, :] >= cdf[..., :, None]

    def find_interval(x):
        x0 = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), -2)
        x1 = jnp.min(jnp.where(~mask, x[..., None], x[..., -1:, None]), -2)
        return x0, x1

    bins_g0, bins_g1 = find_interval(bins)
    cdf_g0, cdf_g1 = find_interval(cdf)

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), 0), 0, 1)
    return bins_g0 + t * (bins_g1 - bins_g0)


def sample_along_rays(
    rng,
    origins,
    directions,
    radii,
    num_samples,
    near,
    far,
    genspace_fn,
    ray_shape,
    single_jitter,
    diag=True,
    transposed=False,
):
    """Stratified fencepost sampling + cone casting (mip.py:297-346).

    transposed=True: means/covs come back [3, N, S] for the fused
    transposed-stream kernels (see mip.lift_gaussian)."""
    t_vals = spacing_core.genspace(near, far, num_samples + 1, fn=genspace_fn)

    sample_shape = list(origins.shape)[:-1] + [num_samples + 1]
    if rng is None:
        t_vals = jnp.broadcast_to(t_vals, sample_shape)
    else:
        if single_jitter:
            t_rand = jax.random.uniform(rng, sample_shape[:-1])[..., None]
        else:
            t_rand = jax.random.uniform(rng, sample_shape)
        t_vals = spacing_core.stratify(jnp.broadcast_to(t_vals, sample_shape), t_rand)

    means, covs = mip_core.cast_rays(
        t_vals, origins, directions, radii, ray_shape, diag=diag,
        transposed=transposed,
    )
    return t_vals, (means, covs)


def resample_along_rays(
    rng,
    origins,
    directions,
    radii,
    t_vals,
    weights,
    ray_shape,
    stop_grad,
    resample_padding,
    single_jitter,
    diag=True,
    transposed=False,
    use_kernel=False,
    mesh=None,
):
    """Blurpool + inverse-CDF resampling for level 2 (mip.py:349-403).

    use_kernel: run blurpool + the hardened inverse CDF in the fused
    pallas kernel (ops/pdf_merge.py::mip_resample_t_vals) instead of the
    O(bins*samples) XLA mask reductions; the draw vector is generated
    here exactly as `sorted_piecewise_constant_pdf` does (the reference
    stream is ascending by construction), so results match. Requires
    stop_grad (the kernel has no VJP; both fused train steps assert
    cfg.stop_level_grad). `mesh`: shard_map over the data axis."""
    num = t_vals.shape[-1]
    if use_kernel and stop_grad and t_vals.ndim == 2 and num <= 128:
        from consistentnerf_tpu.ops import pdf_merge

        u = piecewise_pdf_draws(
            rng, list(t_vals.shape[:-1]), num, single_jitter
        )
        call = pdf_merge.mip_resample_t_vals
        if mesh is not None and mesh.size > 1:
            from jax.sharding import PartitionSpec as P

            data = P("data", None)
            call = jax.shard_map(
                pdf_merge.mip_resample_t_vals,
                mesh=mesh,
                in_specs=(data, data, data, P()),
                out_specs=data,
                check_vma=False,
            )
        new_t_vals = jax.lax.stop_gradient(
            call(jax.lax.stop_gradient(t_vals),
                 jax.lax.stop_gradient(weights), u,
                 jax.lax.stop_gradient(
                     jnp.asarray(resample_padding, jnp.float32)
                 ))
        )
        means, covs = mip_core.cast_rays(
            new_t_vals, origins, directions, radii, ray_shape, diag=diag,
            transposed=transposed,
        )
        return new_t_vals, (means, covs)

    weights_pad = jnp.concatenate(
        [weights[..., :1], weights, weights[..., -1:]], axis=-1
    )
    weights_max = jnp.maximum(weights_pad[..., :-1], weights_pad[..., 1:])
    weights_blur = 0.5 * (weights_max[..., :-1] + weights_max[..., 1:])

    weights = weights_blur + resample_padding

    new_t_vals = sorted_piecewise_constant_pdf(
        rng, t_vals, weights, t_vals.shape[-1], single_jitter=single_jitter
    )
    if stop_grad:
        new_t_vals = jax.lax.stop_gradient(new_t_vals)
    means, covs = mip_core.cast_rays(
        new_t_vals, origins, directions, radii, ray_shape, diag=diag,
        transposed=transposed,
    )
    return new_t_vals, (means, covs)


def vanilla_z_vals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    num_samples: int,
    lindisp: bool,
    t_rand: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Coarse z_vals of the vanilla renderer (run_nerf_view.py:490-512).

    near/far: [N, 1]. Returns [N, num_samples]. `t_rand` (or None) controls
    stratified perturbation.
    """
    t_vals = jnp.linspace(0.0, 1.0, num_samples)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    return spacing_core.stratify(z_vals, t_rand)
