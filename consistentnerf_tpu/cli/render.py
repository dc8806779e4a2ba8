"""Render CLI: path rendering (spiral/spherical) of a trained checkpoint.

Covers `RegNeRF/render.py` and the `--render_only` branch of
`run_nerf_view.py:1188-1216`, including per-frame color/depth PNG dumps.
"""

from __future__ import annotations

import os

import numpy as np

# Fixed per-scene depth-visualization ranges for across-settings-consistent
# renders (RegNeRF/render.py:47-73).
LLFF_DEPTH_RANGES = {
    "fern": [0.059100067913532256, 0.8538959634304046],
    "flower": [0.2099738734960556, 0.996519325375557],
    "fortress": [0.3405687987804413, 0.8795422136783599],
    "horns": [0.3501826047897339, 0.9596474349498749],
    "leaves": [0.00022197533398866584, 0.9934533953666687],
    "orchids": [0.23377860009670257, 0.9828365403413772],
    "room": [0.4059941208362579, 0.9502887094020843],
    "trex": [0.016071857213974, 0.9458529788255692],
}
DTU_DEPTH_RANGES = {
    "scan8": [0.9593777, 1.5342957],
    "scan21": [0.98255014, 1.7484968],
    "scan30": [1.1381109, 1.6074754],
    "scan31": [1.0627427, 1.6069319],
    "scan34": [1.1172018, 1.5005568],
    "scan38": [1.0385504, 1.5373354],
    "scan40": [0.8312144, 1.62111],
    "scan41": [0.9469194, 1.5374442],
    "scan45": [1.0098513, 1.5830635],
    "scan55": [0.85020584, 1.513227],
    "scan63": [1.1894969, 1.7325872],
    "scan82": [1.0984676, 1.7162027],
    "scan103": [1.0771852, 1.5858444],
    "scan110": [0.96143025, 1.5147997],
    "scan114": [0.96940583, 1.548706],
}


def scene_depth_range(cfg):
    name = os.path.basename(os.path.normpath(cfg.datadir))
    if cfg.dataset_type == "llff":
        return LLFF_DEPTH_RANGES.get(name)
    if cfg.dataset_type == "dtu":
        return DTU_DEPTH_RANGES.get(name)
    return None


def main(argv=None):
    from consistentnerf_tpu.cli import common

    p = common.make_parser("Render a camera path from a trained model")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--render-test", action="store_true",
                   help="render test poses instead of the path")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--views-per-call", type=int, default=0,
                   help="views rendered per device dispatch (0 = auto: "
                        "4 on accelerators, 1 on CPU)")
    args = p.parse_args(argv)
    cfg = common.resolve_config(args)
    cfg = common.auto_fused_defaults(cfg, args)
    exp_dir = os.path.join(cfg.basedir, cfg.expname)

    from consistentnerf_tpu.data.loaders import load_scene
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import render as render_lib
    from consistentnerf_tpu.train import vis
    from consistentnerf_tpu.train.checkpoints import CheckpointManager
    from consistentnerf_tpu.train.evaluation import camera_rays_for_view

    scene = load_scene(cfg)
    model = make_model(cfg)

    batcher = loop_lib.make_batcher(scene, cfg)
    state = loop_lib.init_state(cfg, model, batcher.next_batch())
    ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
    state = ckpt.restore_for_eval(state, step=args.step)
    step = int(state.step)

    if args.render_test:
        poses = scene.poses[scene.i_test]
        tag = "test"
    else:
        poses = (
            scene.render_poses
            if scene.render_poses is not None
            else scene.poses[scene.i_test]
        )
        tag = "path"

    out_dir = args.out or os.path.join(
        exp_dir, f"renderonly_{tag}_{step:06d}"
    )
    os.makedirs(out_dir, exist_ok=True)

    render = render_lib.build_render_fn(model, cfg, state.params)
    depth_range = scene_depth_range(cfg)
    lo = hi = None
    if depth_range is not None:
        # The fixed ranges are on disparity (1/depth); visualize_depth
        # takes lo/hi in disparity space too.
        lo, hi = depth_range
    import jax

    def save(i, out):
        out = {k: np.asarray(v) for k, v in out.items()}
        vis.save_img_u8(out["rgb"],
                        os.path.join(out_dir, f"color_{i:03d}.png"))
        vis.save_img_u8(
            vis.visualize_depth(out["depth"], out["acc"], lo=lo, hi=hi),
            os.path.join(out_dir, f"depth_{i:03d}.png"),
        )
        print(f"rendered {i + 1}/{len(poses)}")

    # Two dispatch-amortization layers: several views per jit call
    # (--views-per-call; the per-call dispatch latency on the remote
    # relay is comparable to an image's device time), and group k+1
    # dispatched before group k's frames are fetched.
    g = args.views_per_call
    if g <= 0:
        g = 1 if all(d.platform == "cpu" for d in jax.devices()) else 4
    g = max(1, min(g, len(poses)))

    def group_rays(group_poses):
        rl = [camera_rays_for_view(scene, np.asarray(pp),
                                   render_factor=cfg.render_factor)
              for pp in group_poses]
        # Ragged last group: pad with the last pose (extras dropped on
        # save) so every dispatch compiles to the same shape.
        while len(rl) < g:
            rl.append(rl[-1])
        return render_lib.stack_rays(rl)

    def flush(pending):
        if pending is None:
            return
        s0, sn, souts = pending
        souts = jax.device_get(souts)
        for j in range(sn):
            save(s0 + j, {k: v[j] for k, v in souts.items()})

    pending = None  # (first_frame_idx, n_real, stacked outputs)
    for start in range(0, len(poses), g):
        n_real = min(g, len(poses) - start)
        out = render(group_rays(poses[start: start + n_real]))  # async
        flush(pending)
        pending = (start, n_real, out)
    flush(pending)
    print("wrote", out_dir)


if __name__ == "__main__":
    main()
