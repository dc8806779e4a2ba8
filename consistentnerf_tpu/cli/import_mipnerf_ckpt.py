"""Import Google pretrained mip-NeRF flax checkpoints (RegNeRF format).

The public mip-NeRF checkpoints carry an `MLP_0` with Dense_0..Dense_20
(per-level duplicated heads); RegNeRF's eval remaps them onto its
12-layer MipMLP before restoring (`RegNeRF/eval.py:100-118`): drop
Dense_9 and Dense_17, then Dense_18 -> Dense_9 (bottleneck),
Dense_19 -> Dense_10 (viewdir), Dense_20 -> Dense_11 (rgb). This CLI
applies the same remap and writes an orbax checkpoint this framework's
eval/render CLIs restore directly.

    python -m consistentnerf_tpu.cli.import_mipnerf_ckpt \
        /path/to/flax_checkpoint_250000 /tmp/exp \
        --set backbone=mipnerf

Accepts either a flax.training.checkpoints file (msgpack) or a raw
state-dict pickle with the {'optimizer': {'target': {'params': ...}}}
layout.
"""

from __future__ import annotations

import os

import numpy as np


def remap_pretrained_mlp(mlp: dict, net_depth: int = 8) -> dict:
    """Apply the RegNeRF pretrained-layer remap (eval.py:100-118).

    mlp: {'Dense_i': {'kernel', 'bias'}} with i in 0..20 (pretrained) or
    already 0..net_depth+3 (passthrough). Returns the 12-layer layout
    consumed by models/mlp.py::MipMLP (flatten order: trunk 0..D-1,
    density D, bottleneck D+1, viewdir D+2, rgb D+3).
    """
    n_target = net_depth + 4
    have = {k for k in mlp if k.startswith("Dense_")}
    if have == {f"Dense_{i}" for i in range(n_target)}:
        return dict(mlp)
    out = {k: v for k, v in mlp.items() if k.startswith("Dense_")}
    # Dropped density duplicate (9) and the second level's density (17);
    # bottleneck/viewdir/rgb live at 18/19/20 in the pretrained layout.
    # (The reference hardcodes 9/10/11 destinations for net_depth=8;
    # generalized to D+1/D+2/D+3 here.)
    for i in (9, 17):
        out.pop(f"Dense_{i}", None)
    for src, dst in ((18, net_depth + 1), (19, net_depth + 2),
                     (20, net_depth + 3)):
        if f"Dense_{src}" in out:
            out[f"Dense_{dst}"] = out.pop(f"Dense_{src}")
    missing = {f"Dense_{i}" for i in range(n_target)} - set(out)
    if missing:
        raise KeyError(
            f"pretrained checkpoint is missing layers {sorted(missing)} "
            f"after the eval.py remap; found {sorted(have)}"
        )
    # from_state_dict semantics: layers beyond the target structure
    # (the pretrained Dense_12..16 leftovers) are ignored.
    return {f"Dense_{i}": out[f"Dense_{i}"] for i in range(n_target)}


def load_pretrained_state_dict(path: str) -> dict:
    """Load a flax checkpoint file / directory into a raw state dict."""
    from flax.training import checkpoints as flax_ckpt

    if os.path.isdir(path):
        state = flax_ckpt.restore_checkpoint(path, target=None)
    else:
        state = flax_ckpt.restore_checkpoint(
            os.path.dirname(path) or ".", target=None,
            prefix=os.path.basename(path),
        )
    if state is None:
        raise FileNotFoundError(f"no flax checkpoint found at {path}")
    return state


def pretrained_to_params(state_dict: dict, net_depth: int = 8):
    """{'optimizer': {'target': {'params': {'MLP_0': ...}}}} ->
    (our param tree, step)."""
    opt = state_dict.get("optimizer", state_dict)
    target = opt.get("target", opt)
    params = target.get("params", target)
    mlp_key = "MLP_0" if "MLP_0" in params else "MipMLP_0"
    mlp = remap_pretrained_mlp(params[mlp_key], net_depth)
    tree = {
        "params": {
            "MipMLP_0": {
                k: {
                    "kernel": np.asarray(v["kernel"], np.float32),
                    "bias": np.asarray(v["bias"], np.float32),
                }
                for k, v in mlp.items()
            }
        }
    }
    step = 0
    st = opt.get("state", {})
    if isinstance(st, dict) and "step" in st:
        step = int(np.asarray(st["step"]))
    return tree, step


def main(argv=None):
    from consistentnerf_tpu.cli import common

    p = common.make_parser("Import a pretrained mip-NeRF flax checkpoint")
    p.add_argument("ckpt", help="flax checkpoint file or directory")
    p.add_argument("out", help="experiment dir to write the orbax "
                               "checkpoint into")
    args = p.parse_args(argv)
    cfg = common.resolve_config(args)
    if cfg.backbone != "mipnerf":
        raise SystemExit("importer targets backbone=mipnerf (use "
                         "--set backbone=mipnerf)")

    import jax

    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import checkpoints as ckpt_lib
    from consistentnerf_tpu.train.state import TrainState, make_optimizer

    state_dict = load_pretrained_state_dict(args.ckpt)
    tree, step = pretrained_to_params(state_dict, cfg.netdepth)

    # Validate against a freshly initialized model: same tree structure
    # and leaf shapes, then wrap in a TrainState with a fresh optimizer.
    model = make_model(cfg)
    from consistentnerf_tpu.core.rays import Rays
    import jax.numpy as jnp

    n = 4
    ones = jnp.ones((n, 1))
    d = jnp.ones((n, 3)) / np.sqrt(3.0)
    rays = Rays(origins=jnp.zeros((n, 3)), directions=d, viewdirs=d,
                radii=ones * 1e-3, lossmult=ones, near=ones * cfg.near,
                far=ones * cfg.far)
    ref_params = model.init(jax.random.PRNGKey(0), None, rays)
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_params)
    got_flat = jax.tree_util.tree_leaves_with_path(tree)
    ref_shapes = {jax.tree_util.keystr(k): v.shape for k, v in ref_flat}
    got_shapes = {jax.tree_util.keystr(k): np.shape(v) for k, v in got_flat}
    if ref_shapes != got_shapes:
        only_ref = sorted(set(ref_shapes) - set(got_shapes))
        only_got = sorted(set(got_shapes) - set(ref_shapes))
        mismatch = sorted(
            k for k in set(ref_shapes) & set(got_shapes)
            if ref_shapes[k] != got_shapes[k]
        )
        raise SystemExit(
            f"param tree mismatch: missing={only_ref} extra={only_got} "
            f"shape-mismatch={mismatch}"
        )

    tx = make_optimizer(cfg)
    params = jax.tree_util.tree_map(jnp.asarray, tree)
    state = TrainState(step=step, params=params,
                       opt_state=tx.init(params))
    mgr = ckpt_lib.CheckpointManager(
        os.path.join(args.out, "checkpoints"), keep=100
    )
    mgr.save(max(step, 1), state)
    mgr.close()
    print(f"imported pretrained mip-NeRF checkpoint (step {step}) into "
          f"{args.out}/checkpoints")


if __name__ == "__main__":
    main()
