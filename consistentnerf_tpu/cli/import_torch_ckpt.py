"""Import reference (nerf-pytorch) .tar checkpoints.

Users of the reference can bring trained ConsistentNeRF checkpoints
(`{step:06d}.tar` with `network_fn_state_dict` / `network_fine_state_dict`
— `run_nerf_view.py:2001-2016`) into this framework: layer names map
`pts_linears.{i}` -> `pts_{i}`, `alpha_linear` -> `alpha`,
`feature_linear` -> `feature`, `views_linears.0` -> `views_0`,
`rgb_linear` -> `rgb`, with torch's [out, in] weights transposed to
flax's [in, out]. The ConsistentNeRF temperature scalars transfer
directly.

    python -m consistentnerf_tpu.cli.import_torch_ckpt ckpt.tar out/ \
        --scene lego_3view
"""

from __future__ import annotations

import os

import numpy as np


_LINEAR_MAP = {
    "alpha_linear": "alpha",
    "feature_linear": "feature",
    "rgb_linear": "rgb",
    "output_linear": "output",
}


def state_dict_to_flax(state_dict, net_depth: int = 8):
    """Convert one torch NeRF state_dict to a NeRFMLP param subtree."""
    out = {}

    def put(name, w=None, b=None):
        entry = {}
        if w is not None:
            entry["kernel"] = np.ascontiguousarray(
                np.asarray(w, np.float32).T
            )
        if b is not None:
            entry["bias"] = np.asarray(b, np.float32)
        out[name] = entry

    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in state_dict.items()}

    for i in range(net_depth):
        put(f"pts_{i}", sd[f"pts_linears.{i}.weight"],
            sd[f"pts_linears.{i}.bias"])
    for torch_name, flax_name in _LINEAR_MAP.items():
        if f"{torch_name}.weight" in sd:
            put(flax_name, sd[f"{torch_name}.weight"],
                sd[f"{torch_name}.bias"])
    if "views_linears.0.weight" in sd:
        put("views_0", sd["views_linears.0.weight"],
            sd["views_linears.0.bias"])
    for scalar in ["temp_rgb", "temp_depth", "depth_scale"]:
        if scalar in sd:
            out[scalar] = np.asarray(sd[scalar], np.float32)
    return out


def import_checkpoint(tar_path: str, net_depth: int = 8):
    """Load a reference .tar into {'params': {'coarse':..., 'fine':...}}.

    Returns (params, global_step). Note the reference's naming flip:
    `network_fn` is the COARSE model and `network_fine` the fine one
    (run_nerf_view.py:367-372).
    """
    import torch

    ckpt = torch.load(tar_path, map_location="cpu", weights_only=False)
    params = {"params": {}}
    if "network_fn_state_dict" in ckpt:
        params["params"]["coarse"] = state_dict_to_flax(
            ckpt["network_fn_state_dict"], net_depth
        )
    if "network_fine_state_dict" in ckpt:
        params["params"]["fine"] = state_dict_to_flax(
            ckpt["network_fine_state_dict"], net_depth
        )
    return params, int(ckpt.get("global_step", 0))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("tar", help="reference .tar checkpoint")
    p.add_argument("--scene", default=None, help="preset to size the model")
    p.add_argument("--config", default=None)
    p.add_argument("--set", dest="overrides", action="append", default=[])
    args = p.parse_args(argv)

    from consistentnerf_tpu.cli import common

    class _A:
        scene = args.scene
        config = args.config
        overrides = args.overrides

    cfg = common.resolve_config(_A)
    exp_dir = common.setup_experiment_dir(cfg)

    import jax.numpy as jnp

    params, step = import_checkpoint(args.tar, cfg.netdepth)
    params = {
        "params": {
            k: {
                kk: jnp.asarray(vv) if not isinstance(vv, dict)
                else {k3: jnp.asarray(v3) for k3, v3 in vv.items()}
                for kk, vv in v.items()
            }
            for k, v in params["params"].items()
        }
    }

    from consistentnerf_tpu.train.checkpoints import CheckpointManager
    from consistentnerf_tpu.train.state import create_train_state

    state = create_train_state(cfg, params)
    state = state.replace(step=jnp.asarray(step, jnp.int32))
    mgr = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
    mgr.save(step, state)
    mgr.wait()
    print(f"imported step {step} -> {exp_dir}/checkpoints")


if __name__ == "__main__":
    main()
