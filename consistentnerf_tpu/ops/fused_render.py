"""Deterministic render fast path built on the fused Pallas MLP kernel.

Replicates `VanillaNeRF.__call__`'s test-time (rng=None) pipeline —
stratified coarse z_vals, coarse MLP, compositing, inverse-CDF fine
sampling, fine MLP, compositing — but evaluates both MLPs with
`ops.fused_mlp` so each point costs 6 floats of HBM traffic instead of a
90-float encoding plus layer activations.

Used by `train/render.py` when `Config.use_fused_render` is set; tests
require equality with `model.apply` to fp32 tolerance.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from consistentnerf_tpu.core import rendering, sampling
from consistentnerf_tpu.ops import fused_mlp as fm
from consistentnerf_tpu.ops import pdf_merge


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_samples", "num_importance", "multires", "multires_views",
        "net_depth", "white_bkgd", "lindisp", "tile", "interpret",
        "compute_dtype", "kernel", "onepass", "pdf_kernel",
    ),
)
def fused_render_rays(
    params,
    rays,
    *,
    num_samples: int = 64,
    num_importance: int = 128,
    multires: int = 10,
    multires_views: int = 4,
    net_depth: int = 8,
    white_bkgd: bool = False,
    lindisp: bool = False,
    tile: int = fm.DEFAULT_TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
    kernel: str = "v2",
    onepass: bool = False,
    pdf_kernel: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Deterministic render of a flat Rays batch via the fused kernel.

    With `onepass` the compositing runs INSIDE the kernel
    (ops.fused_onepass.render_level_T): each level's HBM output shrinks
    from the raw [4, N*S] stream to six per-ray rows.
    """
    p = params["params"] if "params" in params else params
    coarse_p = {"params": p["coarse"]}
    fine_p = {"params": p.get("fine", p["coarse"])}

    origins = rays.origins
    directions = rays.directions
    viewdirs = rays.viewdirs
    n = origins.shape[0]

    if onepass:
        from consistentnerf_tpu.ops import fused_onepass as op

        dnorm = jnp.linalg.norm(directions, axis=-1)

        def mega_level(mlp_params, z_vals):
            s = z_vals.shape[1]
            ws = [jnp.asarray(w) for w in
                  fm.flatten_params(mlp_params, True, net_depth)]
            ws = [w[None, :] if w.ndim == 1 else w for w in ws]
            pts_T = (
                origins.T[:, :, None]
                + directions.T[:, :, None] * z_vals[None]
            ).reshape(3, n * s)
            views_T = jnp.broadcast_to(
                viewdirs.T[:, :, None], (3, n, s)
            ).reshape(3, n * s)
            rows = op.render_level_T(
                ws, pts_T, views_T, z_vals.reshape(1, n * s),
                op._rep_row(dnorm, s), seg=s, net_depth=net_depth,
                multires=multires, multires_views=multires_views,
                tile=tile, white_bkgd=white_bkgd, interpret=interpret,
                compute_dtype=compute_dtype,
            )
            per_ray = rows[:, ::s]
            rgb, depth, acc = per_ray[:3].T, per_ray[3], per_ray[4]
            disp = 1.0 / jnp.maximum(
                1e-10 * jnp.ones_like(depth), depth / acc
            )
            return rgb, disp, acc, rows[5].reshape(n, s), depth

        z_vals = sampling.vanilla_z_vals(
            rays.near, rays.far, num_samples, lindisp, None
        )
        rgb, disp, acc, weights, depth = mega_level(coarse_p, z_vals)
        out = {}
        if num_importance > 0:
            out.update(rgb0=rgb, disp0=disp, acc0=acc, depth0=depth)
            z_all = pdf_merge.fine_z_vals(
                z_vals, weights, num_importance, det=True,
                use_kernel=pdf_kernel, interpret=interpret,
            )
            rgb, disp, acc, weights, depth = mega_level(fine_p, z_all)
        out.update(rgb=rgb, disp=disp, acc=acc, depth=depth)
        return out

    transposed = kernel in ("v2", "v2h")
    if transposed:
        from consistentnerf_tpu.ops import fused_mlp_v2 as v2

        def kern(mlp_params, pts_T, views_T):
            weights = [jnp.asarray(w) for w in
                       fm.flatten_params(mlp_params, True, net_depth)]
            weights = [w[None, :] if w.ndim == 1 else w for w in weights]
            return v2._fwd_pallas_T(
                weights, pts_T, views_T, net_depth, (4,), multires,
                multires_views, tile, interpret, compute_dtype,
            )

    elif kernel == "v2row":
        # Row-major v2 forward, so the variant name selects the same
        # layout here as it does in fused_train's A/B harness.
        from consistentnerf_tpu.ops import fused_mlp_v2 as v2

        def kern(mlp_params, pts, views):
            weights = [jnp.asarray(w) for w in
                       fm.flatten_params(mlp_params, True, net_depth)]
            weights = [w[None, :] if w.ndim == 1 else w for w in weights]
            return v2._fwd_pallas(
                weights, pts, views, net_depth, (4,), multires,
                multires_views, tile, interpret, compute_dtype,
            )

    else:
        kern = functools.partial(
            fm.fused_mlp,
            net_depth=net_depth,
            multires=multires,
            multires_views=multires_views,
            tile=tile,
            interpret=interpret,
            compute_dtype=compute_dtype,
        )

    def eval_level(mlp_params, z_vals):
        s = z_vals.shape[1]
        if transposed:
            pts_T = (
                origins.T[:, :, None]
                + directions.T[:, :, None] * z_vals[None, :, :]
            )
            views_T = jnp.broadcast_to(
                viewdirs.T[:, :, None], (3, n, s)
            ).reshape(3, n * s)
            raw_T = kern(mlp_params, pts_T.reshape(3, n * s), views_T)
            return raw_T.reshape(4, n, s)
        pts = (
            origins[..., None, :]
            + directions[..., None, :] * z_vals[..., :, None]
        )
        pts_flat = pts.reshape(n * s, 3)
        views_flat = jnp.broadcast_to(
            viewdirs[:, None, :], (n, s, 3)
        ).reshape(n * s, 3)
        raw = kern(mlp_params, pts_flat, views_flat)
        return raw.reshape(n, s, 4)

    raw2out = rendering.raw2outputs_T if transposed else \
        rendering.raw2outputs

    z_vals = sampling.vanilla_z_vals(
        rays.near, rays.far, num_samples, lindisp, None
    )
    raw = eval_level(coarse_p, z_vals)
    rgb, disp, acc, weights, depth = raw2out(
        raw, z_vals, directions, None, white_bkgd
    )

    out = {}
    if num_importance > 0:
        out.update(rgb0=rgb, disp0=disp, acc0=acc, depth0=depth)
        z_all = pdf_merge.fine_z_vals(
            z_vals, weights, num_importance, det=True,
            use_kernel=pdf_kernel, interpret=interpret,
        )
        raw = eval_level(fine_p, z_all)
        rgb, disp, acc, weights, depth = raw2out(
            raw, z_all, directions, None, white_bkgd
        )
    out.update(rgb=rgb, disp=disp, acc=acc, depth=depth)
    return out
