"""Fused PE + NeRF-MLP evaluation as a single Pallas TPU kernel.

The reference evaluates the vanilla MLP through three Python chunk loops
(`batchify_rays` 8k rays -> `run_network` -> `batchify` 16k points,
`run_nerf_view.py:140-180`), writing the 63-dim positional encoding and
every 256-wide activation to device memory between layers. This kernel
keeps the entire evaluation on-chip:

* inputs are raw points+viewdirs (6 floats/point of HBM traffic instead
  of 90 encoded floats),
* the positional encoding is computed on the VPU inside the kernel,
* all 8 trunk layers + heads run back-to-back on the MXU with weights
  resident in VMEM (~2.6 MB fp32 — far under the ~16 MB budget),
* activations never leave VMEM; only the [N, 4] rgb+density output is
  written back.

Forward-only: the training step uses the XLA path (jit fuses well enough
for backward); this kernel accelerates rendering/eval, which dominates
wall-clock at test time (full images = H*W*(64+128) points).

A pure-jnp `reference_mlp_apply` with identical weight layout is the
correctness oracle; tests require bit-level agreement (fp32).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 512-point tiles keep live activations (tile x 319 fp32, several
# buffers deep) + the 2.6 MB weight set inside the ~16 MB VMEM budget;
# 2048 overflows scoped vmem on v5e.
DEFAULT_TILE = 512


# Process-wide override for auto_interpret's platform heuristic. The
# Mosaic-lowerability smoke tests set this to False on a CPU host so
# `jax.export(..., platforms=["tpu"])` lowers the real kernels through
# Mosaic instead of exporting interpret-mode pallas.
_INTERPRET_OVERRIDE: bool | None = None


@contextlib.contextmanager
def force_interpret(value: bool | None):
    """Temporarily pin auto_interpret(None) to `value`."""
    global _INTERPRET_OVERRIDE
    prev = _INTERPRET_OVERRIDE
    _INTERPRET_OVERRIDE = value
    try:
        yield
    finally:
        _INTERPRET_OVERRIDE = prev


def auto_interpret(interpret):
    """None => interpret on CPU backends (Mosaic only lowers for TPU).

    Checked against jax.devices() rather than default_backend(): after a
    mid-process `jax.config.update("jax_platforms", "cpu")` (the dryrun
    path under this environment's sitecustomize), default_backend() can
    still name the accelerator backend while every addressable device is
    a CPU."""
    if interpret is not None:
        return interpret
    if _INTERPRET_OVERRIDE is not None:
        return _INTERPRET_OVERRIDE
    import jax as _jax

    return all(d.platform == "cpu" for d in _jax.devices())


def _posenc(x, num_freqs):
    """Torch-Embedder-ordered PE (see encoding.posenc_nerf), kernel-safe."""
    if num_freqs == 0:
        return x
    feats = [x]
    for i in range(num_freqs):
        xb = x * (2.0**i)
        feats.append(jnp.sin(xb))
        feats.append(jnp.cos(xb))
    return jnp.concatenate(feats, axis=-1)


def flatten_params(params, use_viewdirs: bool = True,
                   net_depth: int = 8) -> Sequence[jnp.ndarray]:
    """Flatten a NeRFMLP param tree into the kernel's weight list.

    Order: [pts_0_w, pts_0_b, ..., pts_{D-1}_w, pts_{D-1}_b,
            alpha_w, alpha_b, feature_w, feature_b,
            views_0_w, views_0_b, rgb_w, rgb_b]
    """
    p = params["params"] if "params" in params else params
    out = []
    for i in range(net_depth):
        out += [p[f"pts_{i}"]["kernel"], p[f"pts_{i}"]["bias"]]
    if use_viewdirs:
        out += [p["alpha"]["kernel"], p["alpha"]["bias"]]
        out += [p["feature"]["kernel"], p["feature"]["bias"]]
        out += [p["views_0"]["kernel"], p["views_0"]["bias"]]
        out += [p["rgb"]["kernel"], p["rgb"]["bias"]]
    else:
        out += [p["output"]["kernel"], p["output"]["bias"]]
    return out


def _mlp_body(pts, views, weights, *, net_depth, skips, multires,
              multires_views, use_viewdirs, compute_dtype=jnp.float32):
    """The shared forward math, written on values (works in/out of kernel).

    With compute_dtype=bfloat16 the kernel operands of every dot are bf16
    (weights must arrive pre-cast) with fp32 MXU accumulation
    (`preferred_element_type`), fp32 biases and fp32 outputs — the
    single-dtype restructure that avoids Mosaic's mixed-precision
    miscompile while running the MXU at full bf16 rate.
    """
    cd = compute_dtype
    pts_embed = _posenc(pts, multires).astype(cd)  # PE sin/cos in fp32
    h = pts_embed
    wi = 0
    for i in range(net_depth):
        w, b = weights[wi], weights[wi + 1]
        wi += 2
        h = jnp.maximum(
            jnp.dot(h, w, preferred_element_type=jnp.float32) + b, 0.0
        ).astype(cd)
        if i in skips:
            h = jnp.concatenate([pts_embed, h], axis=-1)
    if use_viewdirs:
        views_embed = _posenc(views, multires_views).astype(cd)
        alpha_w, alpha_b = weights[wi], weights[wi + 1]
        feat_w, feat_b = weights[wi + 2], weights[wi + 3]
        v_w, v_b = weights[wi + 4], weights[wi + 5]
        rgb_w, rgb_b = weights[wi + 6], weights[wi + 7]
        alpha = jnp.dot(h, alpha_w,
                        preferred_element_type=jnp.float32) + alpha_b
        feature = (
            jnp.dot(h, feat_w, preferred_element_type=jnp.float32) + feat_b
        ).astype(cd)
        hv = jnp.concatenate([feature, views_embed], axis=-1)
        hv = jnp.maximum(
            jnp.dot(hv, v_w, preferred_element_type=jnp.float32) + v_b, 0.0
        ).astype(cd)
        rgb = jnp.dot(hv, rgb_w, preferred_element_type=jnp.float32) + rgb_b
        return jnp.concatenate(
            [rgb, alpha.astype(jnp.float32)], axis=-1
        )
    w, b = weights[wi], weights[wi + 1]
    return jnp.dot(h, w, preferred_element_type=jnp.float32) + b


def cast_weight_list(weights, compute_dtype):
    """Cast the kernels (even slots) of a flat weight list to the compute
    dtype; biases (odd slots) stay fp32 — they add into the fp32 MXU
    accumulator."""
    return [
        w.astype(compute_dtype) if i % 2 == 0 else w.astype(jnp.float32)
        for i, w in enumerate(weights)
    ]


def reference_mlp_apply(params, pts, viewdirs, *, net_depth=8, skips=(4,),
                        multires=10, multires_views=4, use_viewdirs=True,
                        compute_dtype=jnp.float32):
    """Pure-XLA oracle with the same weight layout as the kernel."""
    weights = flatten_params(params, use_viewdirs, net_depth)
    weights = cast_weight_list(weights, compute_dtype)
    return _mlp_body(
        pts, viewdirs, weights, net_depth=net_depth, skips=tuple(skips),
        multires=multires, multires_views=multires_views,
        use_viewdirs=use_viewdirs, compute_dtype=compute_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "net_depth", "skips", "multires", "multires_views", "use_viewdirs",
        "tile", "interpret", "compute_dtype",
    ),
)
def fused_mlp(
    params,
    pts: jnp.ndarray,
    viewdirs: jnp.ndarray,
    *,
    net_depth: int = 8,
    skips: tuple = (4,),
    multires: int = 10,
    multires_views: int = 4,
    use_viewdirs: bool = True,
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Evaluate the NeRF MLP on [N, 3] points (+viewdirs). Returns [N, 4].

    N is padded to a tile multiple internally; weights live in VMEM for
    the whole grid.
    """
    interpret = auto_interpret(interpret)
    n = pts.shape[0]
    weights = [jnp.asarray(w) for w in
               flatten_params(params, use_viewdirs, net_depth)]
    # Biases must be >=2D for TPU vector layouts inside the kernel.
    weights = [w[None, :] if w.ndim == 1 else w for w in weights]
    # Pre-cast kernels to the compute dtype OUTSIDE the kernel (once for
    # the whole grid) so the kernel body is single-dtype.
    weights = cast_weight_list(weights, compute_dtype)

    pad = (-n) % tile
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], 0)
        viewdirs = jnp.concatenate(
            [viewdirs, jnp.zeros((pad, 3), viewdirs.dtype)], 0
        )
    n_padded = pts.shape[0]
    grid = (n_padded // tile,)

    out_dim = 4 if use_viewdirs else weights[-2].shape[-1]

    def kernel(pts_ref, views_ref, *refs):
        *w_refs, out_ref = refs
        # Keep biases 2-D [1, C]: broadcast-add lowers cleanly in Mosaic
        # (1-D vector layouts do not).
        w_vals = [r[:] for r in w_refs]
        out_ref[:] = _mlp_body(
            pts_ref[:], views_ref[:], w_vals, net_depth=net_depth,
            skips=tuple(skips), multires=multires,
            multires_views=multires_views, use_viewdirs=use_viewdirs,
            compute_dtype=compute_dtype,
        )

    def _whole(w):
        # Bind w per-iteration (late-binding lambdas would alias).
        return pl.BlockSpec(
            w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [_whole(w) for w in weights]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, out_dim), jnp.float32),
        interpret=interpret,
    )(pts, viewdirs, *weights)
    return out[:n]
