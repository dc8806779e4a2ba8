"""Export a trained checkpoint as a reference (nerf-pytorch) .tar.

The inverse of `cli/import_torch_ckpt.py`: models trained here can move
BACK into a reference checkout — e.g. to run the reference's own eval
or to resume a reference experiment — as the `{step:06d}.tar` the
reference writes at `run_nerf_view.py:2001-2016`:

    {'global_step', 'network_fn_state_dict' (COARSE),
     'network_fine_state_dict' (fine), 'optimizer_state_dict'}

Layer-name mapping is the importer's, reversed (`pts_{i}` ->
`pts_linears.{i}`, flax [in, out] kernels transposed to torch
[out, in]); the ConsistentNeRF temperature scalars transfer directly.
The reference never restores `optimizer_state_dict` (the load at
`run_nerf_view.py:351` is commented out), so a fresh-optimizer
placeholder is written for dict-shape compatibility.

    python -m consistentnerf_tpu.cli.export_torch_ckpt out.tar \
        --scene lego_3view
"""

from __future__ import annotations

import os

import numpy as np

from consistentnerf_tpu.cli.import_torch_ckpt import _LINEAR_MAP


def flax_to_state_dict(subtree, net_depth: int = 8):
    """Convert one NeRFMLP param subtree to a torch state_dict."""
    import torch

    sd = {}

    def put(torch_name, entry):
        if "kernel" in entry:
            sd[f"{torch_name}.weight"] = torch.tensor(
                np.ascontiguousarray(np.asarray(entry["kernel"],
                                                np.float32).T)
            )
        if "bias" in entry:
            sd[f"{torch_name}.bias"] = torch.tensor(
                np.asarray(entry["bias"], np.float32)
            )

    for i in range(net_depth):
        put(f"pts_linears.{i}", subtree[f"pts_{i}"])
    for torch_name, flax_name in _LINEAR_MAP.items():
        if flax_name in subtree:
            put(torch_name, subtree[flax_name])
    if "views_0" in subtree:
        put("views_linears.0", subtree["views_0"])
    for scalar in ["temp_rgb", "temp_depth", "depth_scale"]:
        if scalar in subtree:
            sd[scalar] = torch.tensor(
                np.asarray(subtree[scalar], np.float32)
            )
    return sd


def export_checkpoint(params, step: int, out_tar: str,
                      net_depth: int = 8) -> None:
    """Write {'params': {'coarse','fine'}} as a reference .tar."""
    import torch

    tree = params["params"] if "params" in params else params
    ckpt = {
        "global_step": int(step),
        # Reference naming flip: network_fn is the COARSE model
        # (run_nerf_view.py:367-372).
        "network_fn_state_dict": flax_to_state_dict(
            tree["coarse"], net_depth
        ),
        "optimizer_state_dict": {"state": {}, "param_groups": []},
    }
    if "fine" in tree:
        ckpt["network_fine_state_dict"] = flax_to_state_dict(
            tree["fine"], net_depth
        )
    torch.save(ckpt, out_tar)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out_tar", help="output .tar path")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--scene", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--set", dest="overrides", action="append", default=[])
    args = p.parse_args(argv)

    from consistentnerf_tpu.cli import common

    class _A:
        scene = args.scene
        config = args.config
        overrides = args.overrides

    cfg = common.resolve_config(_A)
    assert cfg.backbone == "vanilla", (
        "reference .tar export is for the vanilla (nerf-pytorch) "
        "backbone; mip checkpoints have no torch counterpart format"
    )

    import jax
    import jax.numpy as jnp

    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import step as step_lib
    from consistentnerf_tpu.train.checkpoints import CheckpointManager

    # Template state from dummy rays — export must not need the dataset.
    model = make_model(cfg)
    n = 8
    d = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (n, 1))
    dummy = {"origins": jnp.zeros((n, 3), jnp.float32),
             "directions": jnp.asarray(d)}
    rays = step_lib.rays_from_batch(dummy, cfg.near, cfg.far)
    rng = jax.random.PRNGKey(cfg.seed)
    params = model.init(rng, None, rays)
    from consistentnerf_tpu.train.state import create_train_state

    state = create_train_state(cfg, params)
    exp_dir = os.path.join(cfg.basedir, cfg.expname)
    mgr = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
    if args.step is None and mgr.latest_step() is None:
        raise SystemExit(
            f"no checkpoint found under {exp_dir}/checkpoints — refusing "
            "to export random-init weights"
        )
    state = mgr.restore_for_eval(state, step=args.step)
    step = int(state.step)

    export_checkpoint(
        {"params": state.params["params"]}, step, args.out_tar,
        cfg.netdepth,
    )
    print(f"exported step {step} -> {args.out_tar}")


if __name__ == "__main__":
    main()
