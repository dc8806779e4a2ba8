"""Per-scene training + inference for the learned MVS depth prior.

Replaces the reference's external-notebook producer
(`renderer-copy.ipynb` running a pretrained MVSNeRF checkpoint to emit
`depth_%04d.pfm` priors) with an in-framework trainer: the compact
plane-sweep network in `models/mvs.py` is fit on the scene's own train
views — supervised where GT depth exists (DTU, synthetic), photometric
self-supervision otherwise (blender/LLFF have no GT) — and its depth
maps then feed the exact same consistency pipeline (fusion, hard masks,
depth loss) as external PFMs would.

TPU-first: the whole step (view gather -> feature nets -> plane-sweep
warp -> 3D regularization -> losses -> grads) is ONE jitted program;
view selection is a traced integer gather over the on-device image/pose
stacks, so no per-step host transfers and exactly one compile.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from consistentnerf_tpu.models import mvs as mvs_lib


@dataclasses.dataclass
class MVSTrainResult:
    params: dict
    final_loss: float
    steps: int


def _edge_aware_smoothness(depth: jnp.ndarray, img: jnp.ndarray,
                           near: float, far: float) -> jnp.ndarray:
    """Mean |∂ normalized-depth| weighted down across image edges."""
    d = (depth - near) / max(far - near, 1e-6)
    dx = jnp.abs(d[:, 1:] - d[:, :-1])
    dy = jnp.abs(d[1:, :] - d[:-1, :])
    ix = jnp.exp(-jnp.mean(jnp.abs(img[:, 1:] - img[:, :-1]), -1))
    iy = jnp.exp(-jnp.mean(jnp.abs(img[1:, :] - img[:-1, :]), -1))
    return jnp.mean(dx * ix) + jnp.mean(dy * iy)


def _mvs_loss(cfg, out: Dict, ref_img, src_imgs, c2w_ref, c2w_srcs, K,
              gt_depth: Optional[jnp.ndarray], near: float, far: float):
    """Supervised + photometric + smoothness objective for one triple."""
    depth = out["depth"]
    stats = {}
    loss = 0.0

    if gt_depth is not None:
        valid = (gt_depth > 0).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        l1 = jnp.sum(jnp.abs(depth - gt_depth) * valid) / denom
        gt_lo = jax.image.resize(
            gt_depth, out["depth_lo"].shape, "nearest"
        )
        valid_lo = (gt_lo > 0).astype(jnp.float32)
        l1_lo = jnp.sum(jnp.abs(out["depth_lo"] - gt_lo) * valid_lo) / (
            jnp.maximum(jnp.sum(valid_lo), 1.0)
        )
        sup = l1 + 0.5 * l1_lo
        loss = loss + sup
        stats["sup_l1"] = l1

    if cfg.mvs_photo_weight > 0:
        def photometric(src_img, c2w_src):
            warped, valid = mvs_lib.warp_src_to_ref(
                src_img, depth, c2w_ref, c2w_src, K
            )
            v = valid.astype(jnp.float32)[..., None]
            err = jnp.sum(jnp.abs(warped - ref_img * v)) / (
                jnp.maximum(jnp.sum(v) * 3.0, 1.0)
            )
            return err

        photo = jnp.mean(jax.vmap(photometric)(src_imgs, c2w_srcs))
        loss = loss + cfg.mvs_photo_weight * photo
        stats["photo"] = photo

    if cfg.mvs_smooth_weight > 0:
        smooth = _edge_aware_smoothness(depth, ref_img, near, far)
        loss = loss + cfg.mvs_smooth_weight * smooth
        stats["smooth"] = smooth

    return loss, stats


def build_mvs_train_step(cfg, scene, use_gt: bool) -> Tuple[
        Callable, dict, optax.GradientTransformation]:
    """Returns (jitted step, init params, optimizer).

    step(params, opt_state, ref_idx, src_idx) -> (params, opt_state,
    loss, stats); the image/pose/depth stacks are closed over as device
    constants, view picks are traced int gathers.
    """
    net = mvs_lib.MVSDepthNet(
        num_depths=cfg.mvs_num_depths,
        base_ch=cfg.mvs_base_ch,
        dtype=jnp.dtype(cfg.compute_dtype).type,
    )
    images = jnp.asarray(scene.images[..., :3], jnp.float32)
    poses = jnp.asarray(scene.poses[:, :3, :4], jnp.float32)
    K = jnp.asarray(scene.K, jnp.float32)
    depths = (
        jnp.asarray(scene.depths, jnp.float32)
        if use_gt and scene.depths is not None
        else None
    )
    # Scene bounds (loaders set per-dataset near/far; fall back to cfg).
    near = float(getattr(scene, "near", None) or cfg.near)
    far = float(getattr(scene, "far", None) or cfg.far)

    def forward(params, ref_idx, src_idx):
        return net.apply(
            params,
            images[ref_idx],
            images[src_idx],
            poses[ref_idx],
            poses[src_idx],
            K,
            near,
            far,
        )

    def loss_fn(params, ref_idx, src_idx):
        out = forward(params, ref_idx, src_idx)
        gt = depths[ref_idx] if depths is not None else None
        loss, stats = _mvs_loss(
            cfg, out, images[ref_idx], images[src_idx], poses[ref_idx],
            poses[src_idx], K, gt, near, far,
        )
        return loss, stats

    tx = optax.adam(cfg.mvs_lr)

    @jax.jit
    def step(params, opt_state, ref_idx, src_idx):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, ref_idx, src_idx
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, stats

    i0 = int(np.asarray(scene.i_train)[0])
    src0 = mvs_lib.select_source_views(
        np.asarray(scene.poses), np.asarray(scene.i_train), i0, cfg.mvs_n_src
    )
    params = net.init(
        jax.random.PRNGKey(0),
        images[i0],
        images[jnp.asarray(src0)],
        poses[i0],
        poses[jnp.asarray(src0)],
        K,
        near,
        far,
    )
    return step, params, tx


def train_mvs_depth(
    cfg,
    scene,
    num_steps: int,
    log_fn: Callable[[str], None] = print,
    log_every: int = 100,
) -> MVSTrainResult:
    """Fit the MVS net on the scene's train views.

    Supervision: GT depth when the scene carries one and
    cfg.mvs_supervise_gt is set; pure photometric otherwise. Each step
    trains one (ref, sources) triple, round-robin over train views.
    """
    i_train = np.asarray(scene.i_train)
    has_gt = (
        cfg.mvs_supervise_gt
        and getattr(scene, "depth_is_gt", False)
        and scene.depths is not None
        and float(np.max(np.asarray(scene.depths)[i_train])) > 0
    )
    if len(i_train) < cfg.mvs_n_src + 1:
        raise ValueError(
            f"MVS prior needs >= {cfg.mvs_n_src + 1} train views, "
            f"got {len(i_train)}"
        )
    step, params, tx = build_mvs_train_step(cfg, scene, use_gt=has_gt)
    opt_state = tx.init(params)

    srcs = {
        int(r): mvs_lib.select_source_views(
            np.asarray(scene.poses), i_train, int(r), cfg.mvs_n_src
        )
        for r in i_train
    }
    log_fn(
        f"mvs: training {num_steps} steps on {len(i_train)} views "
        f"({'GT-supervised' if has_gt else 'photometric self-supervised'})"
    )
    loss = np.nan
    for it in range(num_steps):
        ref = int(i_train[it % len(i_train)])
        params, opt_state, loss, stats = step(
            params, opt_state, jnp.int32(ref), jnp.asarray(srcs[ref])
        )
        if log_every and (it % log_every == 0 or it == num_steps - 1):
            extras = " ".join(
                f"{k}={float(v):.4f}" for k, v in stats.items()
            )
            log_fn(f"mvs step {it}/{num_steps} loss={float(loss):.4f} "
                   f"{extras}")
    return MVSTrainResult(
        params=jax.device_get(params),
        final_loss=float(loss),
        steps=num_steps,
    )


@functools.partial(jax.jit, static_argnames=("net", "near", "far"))
def _predict_one(net, params, ref_img, src_imgs, c2w_ref, c2w_srcs, K,
                 near, far):
    return net.apply(params, ref_img, src_imgs, c2w_ref, c2w_srcs, K,
                     near, far)


def predict_depth_priors(
    cfg, scene, params, conf_thresh: Optional[float] = None
) -> np.ndarray:
    """Depth priors [N, H, W] for every train view (zeros elsewhere).

    Low-confidence pixels drop to zero depth — the MVS PFMs' "no prior"
    background convention, which the mask generator and depth loss both
    honor.
    """
    conf_thresh = (
        cfg.mvs_conf_thresh if conf_thresh is None else conf_thresh
    )
    net = mvs_lib.MVSDepthNet(
        num_depths=cfg.mvs_num_depths,
        base_ch=cfg.mvs_base_ch,
        dtype=jnp.dtype(cfg.compute_dtype).type,
    )
    i_train = np.asarray(scene.i_train)
    images = jnp.asarray(scene.images[..., :3], jnp.float32)
    poses = jnp.asarray(scene.poses[:, :3, :4], jnp.float32)
    K = jnp.asarray(scene.K, jnp.float32)
    out = np.zeros(scene.images.shape[:3], np.float32)
    for ref in i_train:
        srcs = mvs_lib.select_source_views(
            np.asarray(scene.poses), i_train, int(ref), cfg.mvs_n_src
        )
        near = float(getattr(scene, "near", None) or cfg.near)
        far = float(getattr(scene, "far", None) or cfg.far)
        pred = _predict_one(
            net, params, images[int(ref)], images[jnp.asarray(srcs)],
            poses[int(ref)], poses[jnp.asarray(srcs)], K, near, far,
        )
        depth = np.asarray(pred["depth"], np.float32)
        conf = np.asarray(pred["conf"], np.float32)
        out[int(ref)] = depth * (conf >= conf_thresh)
    return out
