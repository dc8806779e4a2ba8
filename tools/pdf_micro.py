"""Micro-bench the hierarchical-sampling machinery on the TPU.

Same-claim ablations showed the two-level vanilla step pays ~60 ms over a
single-level step with the same total point count (983k). The MLP is not
the cause; the suspects are sample_pdf (4 take_along_axis gathers + the
O(M*S) compare) and jnp.sort of the concatenated z-values. This times the
pieces in isolation, inside one jit each, with evolving inputs (the relay
caches identical re-executes).

Usage: python tools/pdf_micro.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RAYS = 5120
N_C = 64
N_F = 128


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from consistentnerf_tpu.core import sampling

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    z_vals = jnp.sort(
        jax.random.uniform(k1, (N_RAYS, N_C), minval=2.0, maxval=6.0), -1
    )
    weights = jax.random.uniform(k2, (N_RAYS, N_C - 2))
    u = jax.random.uniform(k3, (N_RAYS, N_F))
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])

    def f_samplepdf(z_vals, s):
        zm = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        return sampling.sample_pdf(zm, weights + s, N_F, u=u)

    def f_pdf_nosort_pipeline(z_vals, s):
        zs = sampling.sample_pdf(
            0.5 * (z_vals[..., 1:] + z_vals[..., :-1]), weights + s, N_F, u=u
        )
        return jnp.concatenate([z_vals, zs], -1)

    def f_full_pipeline(z_vals, s):
        zs = sampling.sample_pdf(
            0.5 * (z_vals[..., 1:] + z_vals[..., :-1]), weights + s, N_F, u=u
        )
        return jnp.sort(jnp.concatenate([z_vals, zs], -1), -1)

    def f_sort(z_vals, s):
        big = jnp.concatenate([z_vals + s, z_vals * 1.7, z_vals * 0.3], -1)
        return jnp.sort(big, -1)

    def f_sort_lax_unstable(z_vals, s):
        big = jnp.concatenate([z_vals + s, z_vals * 1.7, z_vals * 0.3], -1)
        return jax.lax.sort(big, dimension=-1, is_stable=False)

    def f_argsort(z_vals, s):
        big = jnp.concatenate([z_vals + s, z_vals * 1.7, z_vals * 0.3], -1)
        return jnp.argsort(big, -1)

    def f_compare_mask(z_vals, s):
        cdf = jnp.cumsum(weights + s, -1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
        return jnp.sum(
            (cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32), axis=-2
        )

    def f_take_along(z_vals, s):
        cdf = jnp.cumsum(weights + s, -1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
        inds = jnp.sum(
            (cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32), axis=-2
        )
        below = jnp.maximum(0, inds - 1)
        above = jnp.minimum(cdf.shape[-1] - 1, inds)
        a = jnp.take_along_axis(cdf, below, axis=-1)
        b = jnp.take_along_axis(cdf, above, axis=-1)
        c = jnp.take_along_axis(z_mid, jnp.minimum(below, N_C - 2), axis=-1)
        d = jnp.take_along_axis(z_mid, jnp.minimum(above, N_C - 2), axis=-1)
        return a + b + c + d

    def f_onehot_gather(z_vals, s):
        # gather via one-hot matmul (MXU instead of the gather unit)
        cdf = jnp.cumsum(weights + s, -1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
        inds = jnp.sum(
            (cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32), axis=-2
        )
        below = jnp.maximum(0, inds - 1)
        oh = jax.nn.one_hot(below, cdf.shape[-1], dtype=jnp.float32)
        return jnp.einsum("rfm,rm->rf", oh, cdf)

    def f_maskminmax_gather(z_vals, s):
        # find_interval-style: masked max/min reductions, no gather at all
        cdf = jnp.cumsum(weights + s, -1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
        mask = cdf[..., :, None] <= u[..., None, :]  # [R, M, F]
        cdf_b = jnp.max(jnp.where(mask, cdf[..., :, None], cdf[..., :1, None]),
                        -2)
        cdf_a = jnp.min(
            jnp.where(~mask, cdf[..., :, None], cdf[..., -1:, None]), -2
        )
        return cdf_b + cdf_a

    cases = dict(
        samplepdf=f_samplepdf,
        pdf_nosort=f_pdf_nosort_pipeline,
        pdf_sort=f_full_pipeline,
        sort192=f_sort,
        sort192_unstable=f_sort_lax_unstable,
        argsort192=f_argsort,
        cmp_mask=f_compare_mask,
        take_along=f_take_along,
        onehot_gather=f_onehot_gather,
        maskminmax=f_maskminmax_gather,
    )
    names = sys.argv[1:] or list(cases)

    import jax

    results = {}
    for name in names:
        f = jax.jit(cases[name])
        r = f(z_vals, 0.0)
        jax.block_until_ready(r)
        REPS = 30
        best = float("inf")
        for trial in range(3):
            t0 = time.perf_counter()
            out = None
            for i in range(REPS):
                out = f(z_vals, 1e-4 * (trial * REPS + i + 1))
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / REPS)
        results[name] = round(best * 1e3, 3)
        print(name, results[name], "ms", flush=True)
    print("SUMMARY " + json.dumps(results))


if __name__ == "__main__":
    main()
