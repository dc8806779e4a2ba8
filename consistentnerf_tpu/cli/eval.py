"""Eval CLI: render test views of a trained checkpoint + full metric suite.

Covers `RegNeRF/eval.py` and the testset branch of `run_nerf_view.py`
(:2034-2127).
"""

from __future__ import annotations

import os


def main(argv=None):
    from consistentnerf_tpu.cli import common

    p = common.make_parser("Evaluate a trained ConsistentNeRF-TPU model")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default latest)")
    args = p.parse_args(argv)
    cfg = common.resolve_config(args)
    cfg = common.auto_fused_defaults(cfg, args)
    exp_dir = os.path.join(cfg.basedir, cfg.expname)

    from consistentnerf_tpu.data.loaders import load_scene
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train.checkpoints import CheckpointManager
    from consistentnerf_tpu.train.evaluation import evaluate

    scene = load_scene(cfg)
    model = make_model(cfg)

    batcher = loop_lib.make_batcher(scene, cfg)
    state = loop_lib.init_state(cfg, model, batcher.next_batch())
    ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
    state = ckpt.restore_for_eval(state, step=args.step)
    step = int(state.step)
    if step == 0:
        print("warning: no checkpoint found; evaluating random init")

    metrics = evaluate(
        model,
        cfg,
        state.params,
        scene,
        out_dir=os.path.join(exp_dir, "test_preds"),
        step=step,
    )
    for k, v in sorted(metrics.items()):
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
