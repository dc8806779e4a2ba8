"""Test-set evaluation: the full reference metric suite.

Mirrors `RegNeRF/eval.py:137-290` and `run_nerf_view.py:2034-2127`:
PSNR, SSIM, MS-SSIM, LPIPS (VGG), avg_err = geomean(MSE, sqrt(1-SSIM),
LPIPS), census error, plus DTU masked PSNR/SSIM/LPIPS variants; per-metric
txt artifacts consumed by the metric aggregator CLI.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from consistentnerf_tpu.core import mathx
from consistentnerf_tpu.core.rays import Rays
from consistentnerf_tpu.core import rays as rays_core
from consistentnerf_tpu.data.scene import SceneData
from consistentnerf_tpu.train import image_metrics
from consistentnerf_tpu.train import render as render_lib
from consistentnerf_tpu.train.lpips import LPIPS


def camera_rays_for_view(scene: SceneData, pose,
                         render_factor: int = 0) -> Rays:
    """Rays for one camera; render_factor > 0 renders downsampled
    (run_nerf_view.py:256-260 semantics)."""
    h, w, k, focal = scene.H, scene.W, scene.K, scene.focal
    if render_factor and render_factor > 1:
        h, w = h // render_factor, w // render_factor
        k = np.asarray(k).copy()
        k[:2] = k[:2] / render_factor
        focal = focal / render_factor
    return rays_core.camera_rays(
        h,
        w,
        k,
        np.asarray(pose)[:3, :4],
        scene.near,
        scene.far,
        use_ndc=scene.use_ndc,
        ndc_focal=focal,
    )


def _metric_graph(pred, gt, mask=None, lpips_fn: Optional[LPIPS] = None):
    """Pure-jnp metric graph for one view -> dict of 0-dim arrays.

    Shapes are static under jit, so the ms_ssim size gate and the
    mask/lpips presence gates are trace-time Python conditionals. Kept
    fetch-free so `evaluate` can enqueue it on the device stream behind
    the renders and fetch every view's scalars in ONE device_get.
    """
    out = {}
    out["psnr"] = image_metrics.psnr(pred, gt)
    out["ssim"] = image_metrics.ssim(pred[None], gt[None])[0]
    if min(pred.shape[0], pred.shape[1]) >= 176:
        out["ms_ssim"] = image_metrics.ms_ssim(pred[None], gt[None])[0]
    out["census_err"] = mathx.compute_census_err(pred, gt,
                                                 epsilon=1.0 / 255)
    if lpips_fn is not None:
        out["lpips"] = lpips_fn(pred, gt)[0]
        out["avg_err"] = mathx.compute_avg_error(
            out["psnr"], out["ssim"], out["lpips"]
        )
    if mask is not None:
        out["masked_psnr"] = image_metrics.masked_psnr(pred, gt, mask)
        # Masked SSIM/LPIPS: composite both images onto black outside the
        # mask (the DTU-masked convention of RegNeRF eval.py:190-225).
        pm = pred * mask[..., None]
        gm = gt * mask[..., None]
        out["masked_ssim"] = image_metrics.ssim(pm[None], gm[None])[0]
        if lpips_fn is not None:
            out["masked_lpips"] = lpips_fn(pm, gm)[0]
    return out


# One jitted metric graph per LPIPS object (None for the lpips-free
# path); strong refs keep id() keys valid for the process lifetime.
_METRIC_JIT_CACHE: Dict[tuple, tuple] = {}


def _metric_jit(lpips_fn: Optional[LPIPS]):
    key = ("single", 0 if lpips_fn is None else id(lpips_fn))
    if key not in _METRIC_JIT_CACHE:
        import functools

        _METRIC_JIT_CACHE[key] = (
            jax.jit(functools.partial(_metric_graph, lpips_fn=lpips_fn)),
            lpips_fn,
        )
    return _METRIC_JIT_CACHE[key][0]


def _metric_jit_batched(lpips_fn: Optional[LPIPS]):
    """vmapped metric graph over a [V, H, W, 3] view stack — the whole
    group's metric suite in ONE device dispatch (per-view dispatches pay
    the relay latency V times over; measured 77k -> see RUNS_r5 §4)."""
    key = ("batched", 0 if lpips_fn is None else id(lpips_fn))
    if key not in _METRIC_JIT_CACHE:
        _METRIC_JIT_CACHE[key] = (
            jax.jit(jax.vmap(
                lambda p, t: _metric_graph(p, t, None, lpips_fn)
            )),
            lpips_fn,
        )
    return _METRIC_JIT_CACHE[key][0]


def compute_image_metrics(
    pred: np.ndarray,
    gt: np.ndarray,
    lpips_fn: Optional[LPIPS] = None,
    mask: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """All metrics for one (pred, gt) image pair in [0, 1]."""
    graph = _metric_graph(
        jnp.asarray(pred),
        jnp.asarray(gt),
        None if mask is None else jnp.asarray(mask),
        lpips_fn,
    )
    return {k: float(v) for k, v in jax.device_get(graph).items()}


def evaluate(
    model,
    cfg,
    params,
    scene: SceneData,
    out_dir: Optional[str] = None,
    views: Optional[np.ndarray] = None,
    save_images: bool = True,
    step: int = 0,
) -> Dict[str, float]:
    """Render + score the test views; write per-metric txt artifacts."""
    views = scene.i_test if views is None else views
    lpips_fn = None
    if not cfg.eval_disable_lpips:
        lpips_fn = LPIPS(cfg.lpips_weights_path)

    # DTU: prefer the IDR evaluation masks when provided
    # (RegNeRF eval.py:190-225 via datasets._load_masks).
    idr_masks = None
    if (
        cfg.dataset_type == "dtu"
        and not cfg.dtu_no_mask_eval
        and cfg.dtu_mask_path
        and os.path.isdir(cfg.dtu_mask_path)
    ):
        from consistentnerf_tpu.data.dtu import load_idr_masks

        scan = os.path.basename(os.path.normpath(cfg.datadir))
        try:
            idr = load_idr_masks(cfg.dtu_mask_path, scan, cfg.factor)
            idr_masks = {
                int(v): idr[i][..., 0]
                for i, v in enumerate(scene.i_test[: idr.shape[0]])
            }
        except FileNotFoundError:
            idr_masks = None

    render = render_lib.build_render_fn(model, cfg, params)

    import time

    selected = [
        (n, vi) for n, vi in enumerate(views)
        if n % max(1, cfg.eval_render_interval) == 0
    ]

    per_view: List[Dict[str, float]] = []
    # Eval throughput (RegNeRF train.py:518-521), measured over the warm
    # groups. Three dispatch-amortization layers (same as cli/render.py):
    # several views render in ONE jit call ([V, H, W] ray stacks via
    # render_lib.stack_rays); when no image artifacts are requested the
    # per-view metric suite runs as a jitted on-device graph enqueued
    # behind the renders with a SINGLE device_get at the end (no host
    # sync inside the window — a per-view float() sync blocks the host
    # on the in-order device stream and serializes render with metric
    # time, which held eval 7-12x below the benched render rate at
    # 128px POL scale); on the artifact path, group k+1 is dispatched
    # before group k's results are fetched.
    warm_rays = 0
    warm_secs = 0.0

    def view_mask(vi):
        if cfg.dataset_type == "dtu" and not cfg.dtu_no_mask_eval:
            if idr_masks is not None and int(vi) in idr_masks:
                return idr_masks[int(vi)]
            if scene.masks is not None:
                return scene.masks[vi]
        return None

    def process(n, vi, outs):
        outs = {k: np.asarray(v) for k, v in outs.items()}
        gt = scene.images[vi]
        m = compute_image_metrics(
            np.clip(outs["rgb"], 0, 1), gt, lpips_fn, view_mask(vi)
        )
        per_view.append(m)
        if out_dir and save_images and cfg.eval_save_output:
            os.makedirs(out_dir, exist_ok=True)
            from consistentnerf_tpu.train import vis

            vis.save_img_u8(outs["rgb"],
                            os.path.join(out_dir, f"color_{n:03d}.png"))
            vis.save_img_u8(
                vis.visualize_depth(outs["depth"], outs["acc"]),
                os.path.join(out_dir, f"depth_{n:03d}.png"),
            )
            vis.save_img_u8(
                np.repeat(np.clip(outs["acc"], 0, 1)[..., None], 3, -1),
                os.path.join(out_dir, f"acc_{n:03d}.png"),
            )
            if "normals" in outs:
                vis.save_img_u8(
                    vis.visualize_normals(outs["normals"], outs["acc"]),
                    os.path.join(out_dir, f"normals_{n:03d}.png"),
                )

    g = int(getattr(cfg, "eval_views_per_call", 0) or 0)
    if g <= 0:
        g = 1 if all(d.platform == "cpu" for d in jax.devices()) else 4
    # Keep at least two groups so a warm (compile-free) window exists to
    # measure eval_rays_per_sec over — the first group's fetch includes
    # the jit compile and must stay out of the throughput number.
    if selected:
        g = max(1, min(g, (len(selected) + 1) // 2))

    def group_rays(group):
        rl = [camera_rays_for_view(scene, scene.poses[vi])
              for _, vi in group]
        # Ragged last group: pad with the last view (extras dropped at
        # process time) so every dispatch compiles to the same shape.
        while len(rl) < g:
            rl.append(rl[-1])
        return render_lib.stack_rays(rl) if g > 1 else rl[0]

    def process_group(group, souts):
        souts = jax.device_get(souts)
        for j, (n, vi) in enumerate(group):
            if g > 1:
                process(n, vi, {k: v[j] for k, v in souts.items()})
            else:
                process(n, vi, souts)

    groups = [selected[s: s + g] for s in range(0, len(selected), g)]
    save_artifacts = bool(out_dir) and save_images and cfg.eval_save_output
    if not save_artifacts:
        # Deferred path: enqueue every render AND every view's jitted
        # metric graph on the device stream, then fetch all the scalar
        # metrics in one device_get. The warm window (groups 1..K plus
        # every metric graph) is closed by that single fetch, so
        # eval_rays_per_sec measures the actual device pipeline instead
        # of host-sync round trips.
        # Fast path: one vmapped metric dispatch per GROUP. Falls back
        # to per-view metric dispatches when any view carries an eval
        # mask (the DTU-masked suite has per-view mask presence).
        masked = any(view_mask(vi) is not None for _, vi in selected)
        metric_fn = _metric_jit(lpips_fn) if masked else None
        batched_fn = None if masked else _metric_jit_batched(lpips_fn)
        dev_metrics = []  # per group: dict of [g] arrays (or view dicts)
        t_warm = None
        for i, group in enumerate(groups):
            out = render(group_rays(group))  # async dispatch
            if masked:
                for j, (n, vi) in enumerate(group):
                    pred = out["rgb"][j] if g > 1 else out["rgb"]
                    mk = view_mask(vi)
                    dev_metrics.append(metric_fn(
                        jnp.clip(pred, 0, 1),
                        jnp.asarray(scene.images[vi]),
                        None if mk is None else jnp.asarray(mk),
                    ))
            else:
                preds = out["rgb"] if g > 1 else out["rgb"][None]
                gts = [scene.images[vi] for _, vi in group]
                while len(gts) < preds.shape[0]:  # ragged pad, as rays
                    gts.append(gts[-1])
                dev_metrics.append(batched_fn(
                    jnp.clip(preds, 0, 1), jnp.asarray(np.stack(gts))
                ))
            if i == 0:
                # Hard value sync (relay block_until_ready caveat,
                # CLAUDE.md): render + metric jit compiles and the first
                # group stay out of the warm throughput window.
                jax.device_get(dev_metrics)
                float(np.asarray(out["rgb"]).sum())
                t_warm = time.perf_counter()
            else:
                warm_rays += len(group) * scene.H * scene.W
        fetched = jax.device_get(dev_metrics)  # the ONE sync
        if len(groups) > 1:
            warm_secs = time.perf_counter() - t_warm
        else:
            warm_rays = len(selected) * scene.H * scene.W
        if masked:
            per_view.extend(
                {k: float(v) for k, v in m.items()} for m in fetched
            )
        else:
            for group, gm in zip(groups, fetched):
                per_view.extend(
                    {k: float(v[j]) for k, v in gm.items()}
                    for j in range(len(group))  # pads dropped
                )
    else:
        pending = None  # (group, n_real_rays, dispatched-unfetched outs)
        t_warm = None
        for i, group in enumerate(groups):
            rays = group_rays(group)
            n_rays = len(group) * scene.H * scene.W
            out = render(rays)  # async dispatch
            if pending is not None:
                # fetch group i-1 while group i renders
                process_group(pending[0], pending[2])
                if i == 1:
                    # group 0 (jit compile) is fetched; the warm window
                    # times the remaining groups
                    t_warm = time.perf_counter()
                else:
                    warm_rays += pending[1]
            pending = (group, n_rays, out)
        if pending is not None:
            process_group(pending[0], pending[2])
            if len(groups) > 1:
                warm_rays += pending[1]
                warm_secs = time.perf_counter() - t_warm
            else:
                # single group: no warm window; unpipelined rate
                warm_rays = pending[1]

    agg = {}
    if per_view:
        keys = set().union(*[m.keys() for m in per_view])
        for k in sorted(keys):
            vals = [m[k] for m in per_view if k in m]
            agg[k] = float(np.mean(vals))
        if warm_secs > 0:
            agg["eval_rays_per_sec"] = float(warm_rays / warm_secs)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        # Per-metric txt dumps (eval.py:286-290 interface).
        for k, v in agg.items():
            with open(os.path.join(out_dir, f"metric_{k}_{step}.txt"),
                      "w") as f:
                f.write(f"{v}\n")
        with open(os.path.join(out_dir, "metrics.txt"), "w") as f:
            for k, v in agg.items():
                f.write(f"{k}: {v}\n")
        if lpips_fn is not None and not lpips_fn.is_calibrated:
            with open(os.path.join(out_dir, "LPIPS_UNCALIBRATED.txt"),
                      "w") as f:
                f.write(
                    "LPIPS computed with randomly initialized VGG weights "
                    "(no pretrained weights available in this environment); "
                    "values are relative only. Export calibrated weights "
                    "with cli/export_lpips_weights.py.\n"
                )
    return agg
