"""End-to-end render parity vs an independent torch oracle.

Reimplements the complete deterministic vanilla render chain (z_vals ->
PE -> MLP -> compositing -> hierarchical resample -> fine MLP ->
compositing) in torch from the published semantics, loads the SAME
weights into both, and requires the rendered pixels to agree. This is the
strongest single check that the fused JAX pipeline computes the
reference's function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistentnerf_tpu.core.rays import Rays
from consistentnerf_tpu.models.nerf import VanillaNeRF

torch = pytest.importorskip("torch")


def _torch_posenc(x, num_freqs):
    feats = [x]
    for i in range(num_freqs):
        xb = x * (2.0**i)
        feats += [torch.sin(xb), torch.cos(xb)]
    return torch.cat(feats, -1)


def _torch_mlp(params, pts_embed, views_embed, net_depth, skips):
    p = params["params"]

    def lin(name, h):
        w = torch.tensor(np.asarray(p[name]["kernel"]))
        b = torch.tensor(np.asarray(p[name]["bias"]))
        return h @ w + b

    h = pts_embed
    for i in range(net_depth):
        h = torch.relu(lin(f"pts_{i}", h))
        if i in skips:
            h = torch.cat([pts_embed, h], -1)
    alpha = lin("alpha", h)
    feature = lin("feature", h)
    h = torch.relu(lin("views_0", torch.cat([feature, views_embed], -1)))
    rgb = lin("rgb", h)
    return torch.cat([rgb, alpha], -1)


def _torch_raw2outputs(raw, z_vals, rays_d, white_bkgd):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
    rgb = torch.sigmoid(raw[..., :3])
    alpha = 1.0 - torch.exp(-torch.relu(raw[..., 3]) * dists)
    trans = torch.cumprod(
        torch.cat(
            [torch.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1
        ),
        -1,
    )[..., :-1]
    weights = alpha * trans
    rgb_map = torch.sum(weights[..., None] * rgb, -2)
    depth_map = torch.sum(weights * z_vals, -1)
    acc_map = torch.sum(weights, -1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, weights, depth_map


def _torch_sample_pdf_det(bins, weights, n_samples):
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.0, 1.0, n_samples).expand(
        list(cdf.shape[:-1]) + [n_samples]
    ).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    inds_g = torch.stack([below, above], -1)
    matched = [inds_g.shape[0], inds_g.shape[1], cdf.shape[-1]]
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(matched), 2, inds_g)
    bins_g = torch.gather(bins.unsqueeze(1).expand(matched), 2, inds_g)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    return bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])


@pytest.mark.parametrize("white_bkgd", [False, True])
def test_full_render_chain_matches_torch(white_bkgd):
    ns, ni, mr, mv, depth = 16, 8, 6, 3, 3
    skips = (1,)
    model = VanillaNeRF(
        num_samples=ns, num_importance=ni, multires=mr, multires_views=mv,
        net_depth=depth, net_width=48, white_bkgd=white_bkgd,
    )
    # VanillaNeRF hardcodes skips=(4,) in NeRFMLP default... use depth>4?
    # NeRFMLP default skips=(4,): with net_depth=3 the skip never fires;
    # that's fine — the torch oracle uses the same effective skips.
    n = 33
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.1
    ones = jnp.ones((n, 1))
    rays = Rays(origins=o, directions=d, viewdirs=d, radii=ones * 1e-3,
                lossmult=ones, near=ones * 2.0, far=ones * 6.0)
    params = model.init(jax.random.PRNGKey(2), None, rays)
    out_jax = model.apply(params, None, rays)

    # ---- torch oracle ----
    ot = torch.tensor(np.asarray(o))
    dt = torch.tensor(np.asarray(d))
    t_vals = torch.linspace(0.0, 1.0, ns)
    z_vals = 2.0 * (1 - t_vals) + 6.0 * t_vals
    z_vals = z_vals.expand(n, ns)

    def eval_net(branch, z):
        pts = ot[:, None, :] + dt[:, None, :] * z[..., None]
        s = z.shape[1]
        pe = _torch_posenc(pts.reshape(-1, 3), mr)
        ve = _torch_posenc(
            dt[:, None, :].expand(n, s, 3).reshape(-1, 3), mv
        )
        sub = {"params": params["params"][branch]}
        raw = _torch_mlp(sub, pe, ve, depth, (4,))
        return raw.reshape(n, s, 4)

    raw = eval_net("coarse", z_vals)
    rgb0, weights, depth0 = _torch_raw2outputs(raw, z_vals, dt, white_bkgd)

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = _torch_sample_pdf_det(z_mid, weights[..., 1:-1], ni)
    z_all, _ = torch.sort(torch.cat([z_vals, z_samples], -1), -1)
    raw = eval_net("fine", z_all)
    rgb_t, _, depth_t = _torch_raw2outputs(raw, z_all, dt, white_bkgd)

    np.testing.assert_allclose(
        np.asarray(out_jax["rgb0"]), rgb0.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_jax["rgb"]), rgb_t.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_jax["depth"]), depth_t.numpy(), atol=2e-3
    )
