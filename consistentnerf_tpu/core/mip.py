"""Cone/cylinder casting for mip-NeRF: frustum -> Gaussian lifting.

Math follows `RegNeRF/internal/mip.py:51-157` (itself mip-NeRF eq. 7).
"""

from __future__ import annotations

import jax.numpy as jnp


def lift_gaussian(d, t_mean, t_var, r_var, diag: bool,
                  transposed: bool = False):
    """Lift a 1-D Gaussian along a ray into 3D (mip.py:51-71).

    transposed=True (diag only): emit means/covs as [3, N, S] instead of
    [N, S, 3] — the row-major orientation pads 3 lanes to 128 in HBM
    (T(8,128) tiling, ~42x traffic) on every consumer; the transposed
    stream keeps S on the lane axis and feeds the fused kernels."""
    if transposed:
        assert diag, "transposed lift_gaussian supports diag only"
        dT = d.T  # [3, N]
        mean_T = dT[:, :, None] * t_mean[None, :, :]
        d_mag_sq = jnp.maximum(1e-10, jnp.sum(d**2, axis=-1))  # [N]
        d_outer_diag_T = dT**2
        null_outer_diag_T = 1 - d_outer_diag_T / d_mag_sq[None, :]
        t_cov_T = t_var[None, :, :] * d_outer_diag_T[:, :, None]
        xy_cov_T = r_var[None, :, :] * null_outer_diag_T[:, :, None]
        return mean_T, t_cov_T + xy_cov_T
    mean = d[..., None, :] * t_mean[..., None]

    d_mag_sq = jnp.maximum(1e-10, jnp.sum(d**2, axis=-1, keepdims=True))

    if diag:
        d_outer_diag = d**2
        null_outer_diag = 1 - d_outer_diag / d_mag_sq
        t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
        xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
        return mean, t_cov_diag + xy_cov_diag
    d_outer = d[..., :, None] * d[..., None, :]
    eye = jnp.eye(d.shape[-1])
    null_outer = eye - d[..., :, None] * (d / d_mag_sq)[..., None, :]
    t_cov = t_var[..., None, None] * d_outer[..., None, :, :]
    xy_cov = r_var[..., None, None] * null_outer[..., None, :, :]
    return mean, t_cov + xy_cov


def conical_frustum_to_gaussian(d, t0, t1, base_radius, diag,
                                stable: bool = True,
                                transposed: bool = False):
    """Approximate a conical frustum as a Gaussian (mip.py:74-108)."""
    if stable:
        mu = (t0 + t1) / 2
        hw = (t1 - t0) / 2
        eps = jnp.finfo(jnp.float32).eps
        t_mean = mu + (2 * mu * hw**2) / jnp.maximum(eps, 3 * mu**2 + hw**2)
        denom = jnp.maximum(eps, 3 * mu**2 + hw**2)
        t_var = (hw**2) / 3 - (4 / 15) * hw**4 * (12 * mu**2 - hw**2) / denom**2
        r_var = (mu**2) / 4 + (5 / 12) * hw**2 - (4 / 15) * (hw**4) / denom
    else:
        t_mean = (3 * (t1**4 - t0**4)) / (4 * (t1**3 - t0**3))
        r_var = 3 / 20 * (t1**5 - t0**5) / (t1**3 - t0**3)
        t_mosq = 3 / 5 * (t1**5 - t0**5) / (t1**3 - t0**3)
        t_var = t_mosq - t_mean**2
    r_var = r_var * base_radius**2
    return lift_gaussian(d, t_mean, t_var, r_var, diag,
                         transposed=transposed)


def cylinder_to_gaussian(d, t0, t1, radius, diag, transposed: bool = False):
    """Approximate a cylinder as a Gaussian (mip.py:111-130)."""
    t_mean = (t0 + t1) / 2
    r_var = radius**2 / 4
    t_var = (t1 - t0) ** 2 / 12
    return lift_gaussian(d, t_mean, t_var, r_var, diag,
                         transposed=transposed)


def cast_rays(t_vals, origins, directions, radii, ray_shape: str,
              diag: bool = True, transposed: bool = False):
    """Featurize ray sections between fenceposts t_vals (mip.py:133-157).

    transposed=True: means/covs come back [3, N, S] (see lift_gaussian)."""
    t0 = t_vals[..., :-1]
    t1 = t_vals[..., 1:]
    if ray_shape == "cone":
        gaussian_fn = conical_frustum_to_gaussian
    elif ray_shape == "cylinder":
        gaussian_fn = cylinder_to_gaussian
    else:
        raise ValueError(f"ray_shape must be cone|cylinder, got {ray_shape!r}")
    means, covs = gaussian_fn(directions, t0, t1, radii, diag,
                              transposed=transposed)
    if transposed:
        means = means + origins.T[:, :, None]
    else:
        means = means + origins[..., None, :]
    return means, covs
