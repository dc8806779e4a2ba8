"""End-to-end render AND training-loss parity vs independent torch oracles.

Reimplements the complete deterministic vanilla render chain (z_vals ->
PE -> MLP -> compositing -> hierarchical resample -> fine MLP ->
compositing) in torch from the published semantics, loads the SAME
weights into both, and requires the rendered pixels to agree; then
extends the oracle through the FULL ConsistentNeRF training loss
(run_nerf_view.py:1645-1906 — hard-masked RGB + masked depth + MiDaS
patch + patch SSIM + patch LPIPS, fine and coarse duplicates) and
requires the loss scalar and parameter gradients to agree. This is the
strongest paper-parity check obtainable without real datasets.
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


# ---------------------------------------------------------------------------
# Full ConsistentNeRF training loss + gradients (run_nerf_view.py:1645-1906)
# ---------------------------------------------------------------------------


def _torch_ssim(img0, img1):
    """Valid-mode separable-gaussian SSIM on [B, H, W, C] (differentiable),
    the same construction as train/image_metrics.ssim."""
    import torch.nn.functional as F

    a = img0.permute(0, 3, 1, 2)
    b = img1.permute(0, 3, 1, 2)
    size = min(11, a.shape[2], a.shape[3])
    if size % 2 == 0:
        size -= 1
    x = torch.arange(size, dtype=torch.float64) - (size - 1) / 2
    g = torch.exp(-(x**2) / (2 * 1.5**2))
    g = (g / g.sum()).to(a.dtype).reshape(1, 1, 1, size)

    def blur(img):
        c = img.shape[1]
        img = F.conv2d(img, g.expand(c, 1, 1, size), groups=c)
        img = F.conv2d(img, g.transpose(2, 3).expand(c, 1, size, 1),
                       groups=c)
        return img

    mu0, mu1 = blur(a), blur(b)
    s00 = blur(a * a) - mu0 * mu0
    s11 = blur(b * b) - mu1 * mu1
    s01 = blur(a * b) - mu0 * mu1
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) / (
        (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
    )
    return smap.mean(dim=(1, 2, 3))


def _torch_lpips_diff(lp_params, img0, img1):
    """Differentiable transcription of the lpips-VGG forward (see
    tests/test_lpips_torch_equality.py) on [B, H, W, 3] tensors in
    [-1, 1]. Returns [B]."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def features(img):
        x = img.permute(0, 3, 1, 2)
        x = (x - shift) / scale
        feats = []
        n_blocks = len(lp_params["convs"])
        for bi, block in enumerate(lp_params["convs"]):
            for conv in block:
                w = torch.tensor(np.asarray(conv["w"])).permute(3, 2, 0, 1)
                b = torch.tensor(np.asarray(conv["b"]))
                x = F.relu(F.conv2d(x, w, b, stride=1, padding=1))
            feats.append(x)
            if bi < n_blocks - 1:
                x = F.max_pool2d(x, kernel_size=2, stride=2)
        return feats

    f0s, f1s = features(img0), features(img1)
    val = 0.0
    for f0, f1, lin in zip(f0s, f1s, lp_params["lins"]):
        eps = 1e-10
        n0 = f0 / (torch.sqrt(torch.sum(f0**2, 1, keepdim=True)) + eps)
        n1 = f1 / (torch.sqrt(torch.sum(f1**2, 1, keepdim=True)) + eps)
        lin_w = torch.tensor(np.asarray(lin)).view(1, -1, 1, 1)
        val = val + torch.sum((n0 - n1) ** 2 * lin_w, 1).mean(dim=(1, 2))
    return val


def _torch_midas_patch_loss(depth_pred, mono_disp, ps, npatch):
    """run_nerf_view.py:1679-1722, transcribed verbatim."""
    p2 = ps * ps
    depth_predict_clip = 1 / torch.where(
        depth_pred <= 0, 0.0001 * torch.ones(1), depth_pred
    )
    depth_mse = 0.0
    for i_patch in range(npatch):
        depth_predict = torch.nan_to_num(
            depth_predict_clip[i_patch * p2:(i_patch + 1) * p2]
        )
        depth_gt = torch.nan_to_num(
            mono_disp[i_patch * p2:(i_patch + 1) * p2]
        )
        mask = torch.where(depth_gt > 0, torch.ones(1), torch.zeros(1))

        depth_min = torch.where(
            depth_gt > 0, depth_gt, torch.ones(1) * 10**5
        ).min()
        depth_max = depth_gt.max()
        depth_gt = mask * (depth_gt - depth_min) / (
            depth_max - depth_min + 0.0001
        )

        depth_min = torch.where(
            mask * depth_predict > 0, depth_predict, torch.ones(1) * 10**5
        ).min()
        depth_max = (mask * depth_predict).max()
        depth_predict = mask * (depth_predict - depth_min) / (
            depth_max - depth_min + 0.0001
        )

        alpha = (depth_predict - depth_gt).mean()
        depth_mse = depth_mse + (
            (depth_gt - depth_predict + alpha) ** 2
        ).mean() / npatch / 2
    return depth_mse


def test_full_training_loss_and_grads_match_torch():
    """One full ConsistentNeRF training loss (hard-masked RGB + masked
    depth + MiDaS + patch SSIM + patch LPIPS, fine AND coarse) on shared
    weights/batch: loss scalar to ~1e-5, gradient cosine ~1.

    Transcribes run_nerf_view.py:1645-1906 in torch around the render
    oracle above. Two documented intentional divergences from the
    reference are mirrored on the oracle side: SSIM gets proper NHWC
    patches (the reference feeds NHWC into an NCHW pytorch_msssim), and
    LPIPS is the lpips-VGG function with our shared random weights (the
    reference loads calibrated weights, unavailable offline; function
    equality is pinned by tests/test_lpips_torch_equality.py)."""
    from consistentnerf_tpu.configs import Config
    from consistentnerf_tpu.train import lpips as lpips_mod
    from consistentnerf_tpu.train.losses import vanilla_losses

    ns, ni, mr, mv, net_depth = 12, 6, 4, 2, 3
    far = 6.0
    cfg = Config(
        backbone="vanilla", hardmask=True, with_depth_loss=True,
        n_patches=4, patch_size=16, use_batching=False,
        N_samples=ns, N_importance=ni, multires=mr, multires_views=mv,
        netdepth=net_depth, netwidth=48,
    )
    model = VanillaNeRF(
        num_samples=ns, num_importance=ni, multires=mr, multires_views=mv,
        net_depth=net_depth, net_width=48, white_bkgd=False,
    )
    n = cfg.n_patches * cfg.patch_size**2 + 64  # patches first, then rays
    key = jax.random.PRNGKey(5)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jax.random.normal(jax.random.PRNGKey(6), (n, 3)) * 0.1
    ones = jnp.ones((n, 1))
    rays = Rays(origins=o, directions=d, viewdirs=d, radii=ones * 1e-3,
                lossmult=ones, near=ones * 2.0, far=ones * far)
    params = model.init(jax.random.PRNGKey(7), None, rays)
    lpips_params = lpips_mod.init_params(jax.random.PRNGKey(8))

    rng = np.random.RandomState(9)
    batch = {
        "rgb": jnp.asarray(rng.rand(n, 3), jnp.float32),
        "depth": jnp.asarray(2.0 + 4.0 * rng.rand(n), jnp.float32),
        "mask": jnp.asarray((rng.rand(n) > 0.3), jnp.float32),
        "mono_disp": jnp.asarray(
            np.where(rng.rand(n) > 0.2, rng.rand(n), 0.0), jnp.float32
        ),
    }

    def jax_loss(p):
        outputs = model.apply(p, None, rays)
        loss, stats = vanilla_losses(outputs, batch, cfg, far, 1.0,
                                     lpips_params)
        return loss, stats

    (loss_jax, stats_jax), grads_jax = jax.value_and_grad(
        jax_loss, has_aux=True
    )(params)

    # ---- torch oracle ----
    tp = {}
    for branch in ("coarse", "fine"):
        bp = {}
        for name, leaf in params["params"][branch].items():
            if isinstance(leaf, dict) and "kernel" in leaf:
                bp[name] = {
                    k: torch.tensor(np.asarray(v), requires_grad=True)
                    for k, v in leaf.items()
                }
            else:
                bp[name] = torch.tensor(np.asarray(leaf),
                                        requires_grad=True)
        tp[branch] = bp

    def t_lin(branch, name, h):
        return h @ tp[branch][name]["kernel"] + tp[branch][name]["bias"]

    def t_mlp(branch, pts_embed, views_embed):
        h = pts_embed
        for i in range(net_depth):
            h = torch.relu(t_lin(branch, f"pts_{i}", h))
            if i in (4,):
                h = torch.cat([pts_embed, h], -1)
        alpha = t_lin(branch, "alpha", h)
        feature = t_lin(branch, "feature", h)
        h = torch.relu(
            t_lin(branch, "views_0", torch.cat([feature, views_embed], -1))
        )
        rgb = t_lin(branch, "rgb", h)
        return torch.cat([rgb, alpha], -1)

    ot = torch.tensor(np.asarray(o))
    dt = torch.tensor(np.asarray(d))
    t_vals = torch.linspace(0.0, 1.0, ns)
    z_vals = (2.0 * (1 - t_vals) + far * t_vals).expand(n, ns)

    def eval_net(branch, z):
        pts = ot[:, None, :] + dt[:, None, :] * z[..., None]
        s = z.shape[1]
        pe = _torch_posenc(pts.reshape(-1, 3), mr)
        ve = _torch_posenc(dt[:, None, :].expand(n, s, 3).reshape(-1, 3),
                           mv)
        return t_mlp(branch, pe, ve).reshape(n, s, 4)

    raw = eval_net("coarse", z_vals)
    rgb0_t, weights_t, depth0_t = _torch_raw2outputs(
        raw, z_vals, dt, False
    )
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = _torch_sample_pdf_det(
        z_mid, weights_t[..., 1:-1], ni
    ).detach()  # stop_gradient on resampled t_vals, as in the reference
    z_all, _ = torch.sort(torch.cat([z_vals, z_samples], -1), -1)
    raw = eval_net("fine", z_all)
    rgb_t, _, depth_t = _torch_raw2outputs(raw, z_all, dt, False)

    target = torch.tensor(np.asarray(batch["rgb"]))
    mask = torch.tensor(np.asarray(batch["mask"]))
    depth_prior = torch.tensor(np.asarray(batch["depth"]))
    mono = torch.tensor(np.asarray(batch["mono_disp"]))
    ps, npatch = cfg.patch_size, cfg.n_patches
    p2 = ps * ps

    def mse(a, b):
        return ((a - b) ** 2).mean()

    def level_loss(rgb_lvl, depth_lvl):
        # hard-masked RGB (run_nerf_view.py:1645-1648)
        img_loss = mse(rgb_lvl[mask == 1], target[mask == 1])
        if mask.sum() != n:
            img_loss = img_loss + cfg.hardmask_coef * mse(
                rgb_lvl[mask == 0], target[mask == 0]
            )
        # patch terms (1679-1728)
        mono_l = _torch_midas_patch_loss(depth_lvl, mono, ps, npatch)
        img_pred = rgb_lvl[: npatch * p2].reshape(npatch, ps, ps, 3)
        img_gt = target[: npatch * p2].reshape(npatch, ps, ps, 3)
        ssim_l = _torch_ssim(img_pred, img_gt).sum() / npatch
        lp_l = _torch_lpips_diff(
            lpips_params, img_pred * 2 - 1, img_gt * 2 - 1
        ).sum() / npatch
        # masked depth (1737)
        depth_l = mse(
            depth_lvl[mask == 1] / far, depth_prior[mask == 1] / far
        )
        total = (
            img_loss + 0.001 * mono_l - 0.005 * ssim_l + 0.005 * lp_l
            + depth_l
        )
        return total, img_loss, mono_l, ssim_l, lp_l, depth_l

    fine = level_loss(rgb_t, depth_t)
    coarse = level_loss(rgb0_t, depth0_t)
    loss_torch = fine[0] + coarse[0]
    loss_torch.backward()

    # Per-term agreement (diagnostic granularity)
    for got, want, label in [
        (stats_jax["img_loss"], fine[1], "img_loss"),
        (stats_jax["mono_depth_loss"], fine[2], "mono"),
        (stats_jax["patch_ssim"], fine[3], "ssim"),
        (stats_jax["patch_lpips"], fine[4], "lpips"),
        (stats_jax["depth_loss"], fine[5], "depth"),
        (stats_jax["img_loss0"], coarse[1], "img_loss0"),
        (stats_jax["depth_loss0"], coarse[5], "depth0"),
    ]:
        np.testing.assert_allclose(
            float(got), float(want.detach()), rtol=5e-5, atol=1e-6,
            err_msg=label,
        )
    np.testing.assert_allclose(
        float(loss_jax), float(loss_torch.detach()), rtol=2e-5
    )

    # Gradient cosine over all kernel/bias leaves, matched by name.
    g_jax, g_torch = [], []
    for branch in ("coarse", "fine"):
        for name in sorted(params["params"][branch]):
            leaf = grads_jax["params"][branch][name]
            tleaf = tp[branch][name]
            if isinstance(leaf, dict):
                for k in sorted(leaf):
                    g_jax.append(np.asarray(leaf[k]).ravel())
                    tg = tleaf[k].grad
                    g_torch.append(
                        np.zeros(tleaf[k].numel(), np.float32)
                        if tg is None else tg.numpy().ravel()
                    )
            else:
                g_jax.append(np.asarray(leaf).ravel())
                tg = tleaf.grad
                g_torch.append(
                    np.zeros(tleaf.numel(), np.float32)
                    if tg is None else tg.numpy().ravel()
                )
    gj = np.concatenate(g_jax).astype(np.float64)
    gt = np.concatenate(g_torch).astype(np.float64)
    cos = float(gj @ gt / (np.linalg.norm(gj) * np.linalg.norm(gt)))
    assert cos > 1 - 1e-6, f"gradient cosine {cos}"
    np.testing.assert_allclose(
        np.linalg.norm(gj), np.linalg.norm(gt), rtol=1e-4
    )
