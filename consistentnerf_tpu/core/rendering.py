"""Alpha compositing / volumetric rendering for both backbones.

`raw2outputs` reproduces the vanilla renderer's semantics
(`run_nerf_view.py:392-438`); `compute_alpha_weights` +
`volumetric_rendering` reproduce the mip renderer's
(`RegNeRF/internal/mip.py:195-294`). Both are pure jnp and fuse fully under
jit; XLA keeps the cumsum/cumprod scans on-chip.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from consistentnerf_tpu.core import mathx


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
    white_bkgd: bool = False,
):
    """Vanilla-NeRF compositing (run_nerf_view.py:392-438).

    raw: [N, S, 4] (rgb logits + density logits), z_vals: [N, S],
    rays_d: [N, 3]. `noise` (or None) is the raw-density regularization noise.
    Returns (rgb_map, disp_map, acc_map, weights, depth_map).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1
    )  # [N, S]
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])  # [N, S, 3]
    density_logit = raw[..., 3]
    if noise is not None:
        density_logit = density_logit + noise

    alpha = 1.0 - jnp.exp(-jax.nn.relu(density_logit) * dists)  # [N, S]

    # Exclusive cumprod of transmittance 1-alpha (+1e-10 like the reference).
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1
        ),
        -1,
    )[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, -2)
    depth_map = jnp.sum(weights * z_vals, -1)
    acc_map = jnp.sum(weights, -1)
    disp_map = 1.0 / jnp.maximum(
        1e-10 * jnp.ones_like(depth_map), depth_map / acc_map
    )

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return rgb_map, disp_map, acc_map, weights, depth_map


def raw2outputs_T(
    raw_T: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
    white_bkgd: bool = False,
):
    """raw2outputs on a TRANSPOSED raw stream: raw_T [4, N, S].

    Numerically identical to raw2outputs(raw.transpose(1, 2, 0), ...)
    but never materializes an [N, S, 4] array — that orientation pads 4
    lanes to 128 in HBM (T(8,128) tiling, ~32x traffic); here every
    intermediate is [N, S] or [3, N, S] with S on the lane axis. Returns
    the usual (rgb_map [N, 3], disp, acc, weights [N, S], depth)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1
    )  # [N, S]
    dists = dists * jnp.linalg.norm(rays_d, axis=-1)[..., None]

    rgb_T = jax.nn.sigmoid(raw_T[:3])  # [3, N, S]
    density_logit = raw_T[3]  # [N, S]
    if noise is not None:
        density_logit = density_logit + noise

    alpha = 1.0 - jnp.exp(-jax.nn.relu(density_logit) * dists)
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1
        ),
        -1,
    )[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[None] * rgb_T, -1).T  # [N, 3]
    depth_map = jnp.sum(weights * z_vals, -1)
    acc_map = jnp.sum(weights, -1)
    disp_map = 1.0 / jnp.maximum(
        1e-10 * jnp.ones_like(depth_map), depth_map / acc_map
    )

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return rgb_map, disp_map, acc_map, weights, depth_map


def compute_alpha_weights(density, t_vals, dirs):
    """mip-NeRF alpha weights from density between fenceposts (mip.py:195-208)."""
    t_dists = t_vals[..., 1:] - t_vals[..., :-1]
    delta = t_dists * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    density_delta = density * delta

    alpha = 1 - jnp.exp(-density_delta)
    trans = jnp.exp(
        -jnp.concatenate(
            [
                jnp.zeros_like(density_delta[..., :1]),
                jnp.cumsum(density_delta[..., :-1], axis=-1),
            ],
            axis=-1,
        )
    )
    weights = alpha * trans
    return weights, alpha, trans, delta


def volumetric_rendering(
    rgbs,
    weights,
    normals,
    t_vals,
    white_background: bool,
    vis_num_rays: int,
    compute_extras: bool,
    delta,
    rgbs_T=None,
):
    """mip-NeRF rendering dict (mip.py:211-294).

    rgbs_T (optional): the per-sample colors as a TRANSPOSED [3, N, S]
    stream instead of `rgbs` [N, S, 3]; avoids materializing the
    lane-padded row-major array (the fused kernels emit [3, N, S]).
    Pass rgbs=None with it; the extras' ray_rgbs visualization slices
    are transposed back after slicing (vis_num_rays rows only)."""
    t_mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])

    if rgbs_T is not None:
        rgb = jnp.moveaxis((weights[None] * rgbs_T).sum(axis=-1), 0, -1)
    else:
        rgb = (weights[..., None] * rgbs).sum(axis=-2)
    acc = weights.sum(axis=-1)
    if white_background:
        rgb = rgb + (1.0 - acc[..., None])

    rendering = {"rgb": rgb}
    expectation = lambda x: (weights * x).sum(axis=-1) / acc
    rendering["distance_mean"] = jnp.clip(
        jnp.nan_to_num(expectation(t_mids), nan=jnp.inf),
        t_vals[..., 0],
        t_vals[..., -1],
    )

    if compute_extras:
        eps = jnp.finfo(jnp.float32).eps

        rendering["acc"] = acc
        normals_map = (weights[..., None] * normals).sum(axis=-2)
        if white_background:
            normals_map = normals_map + (1.0 - acc[..., None])
        rendering["normals"] = normals_map

        expectation_save = lambda x: (weights * x).sum(-1) / jnp.clip(acc, eps)
        rendering["distance_mean_save"] = jnp.clip(
            expectation_save(t_mids), t_vals[..., 0], t_vals[..., -1]
        )
        rendering["distance_std"] = jnp.nan_to_num(
            jnp.maximum(
                0.0,
                jnp.sqrt(expectation(t_mids**2) - rendering["distance_mean"] ** 2),
            ),
            nan=0.0,
        )

        ps = [5, 25, 50, 75, 95]
        distance_percentiles = jax.vmap(
            functools.partial(mathx.weighted_percentile, ps=ps, assume_sorted=True),
            0,
        )(
            t_mids.reshape([-1, t_mids.shape[-1]]),
            weights.reshape([-1, weights.shape[-1]]),
        )
        distance_percentiles = distance_percentiles.reshape(
            list(t_mids.shape[:-1]) + [len(ps)]
        )
        for i, p in enumerate(ps):
            s = "median" if p == 50 else "percentile_" + str(p)
            rendering["distance_" + s] = distance_percentiles[..., i]

        # Ray-bundle visualizations (vis.py consumes the `ray_*` keys).
        t_vals_flat = t_vals.reshape([-1, t_vals.shape[-1]])
        weights_flat = weights.reshape([-1, weights.shape[-1]])
        if rgbs_T is not None:
            s = rgbs_T.shape[-1]
            rgbs_head = rgbs_T.reshape([3, -1, s])[:, :vis_num_rays, :]
            rendering_ray_rgbs = jnp.moveaxis(rgbs_head, 0, -1)
        else:
            rgbs_flat = rgbs.reshape([-1] + list(rgbs.shape[-2:]))
            rendering_ray_rgbs = rgbs_flat[:vis_num_rays, :, :]
        rendering["ray_t_vals"] = t_vals_flat[:vis_num_rays, :]
        rendering["ray_weights"] = weights_flat[:vis_num_rays, :]
        rendering["ray_weights_full"] = weights_flat
        rendering["ray_rgbs"] = rendering_ray_rgbs

    return rendering
