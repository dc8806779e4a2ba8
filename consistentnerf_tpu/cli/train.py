"""Train CLI: `python -m consistentnerf_tpu.cli.train --scene lego_3view`.

Covers the reference's train entry points (`run_nerf_view.py`,
`RegNeRF/train.py`): loads the scene, generates/caches consistency masks,
trains with checkpointing, optional final test-set eval.
"""

from __future__ import annotations

import os


def main(argv=None):
    from consistentnerf_tpu.cli import common

    p = common.make_parser("Train a ConsistentNeRF-TPU model")
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--eval-after", action="store_true",
                   help="run test-set eval when training finishes")
    p.add_argument(
        "--bootstrap-priors", type=int, default=0, metavar="WARMUP_STEPS",
        help="two-stage flow: warmup NeRF (no consistency terms) for N "
        "steps, render per-view depth priors, regenerate hard masks, "
        "then run the consistent training on those priors (replaces the "
        "reference's external MVSNeRF prior producer)",
    )
    args = p.parse_args(argv)
    cfg = common.resolve_config(args)
    cfg = common.auto_fused_defaults(cfg, args)
    cfg = common.reconcile_schedule_horizon(cfg, args)
    cfg = common.guard_known_compiler_ice(cfg, args)
    exp_dir = common.setup_experiment_dir(cfg)

    from consistentnerf_tpu.data.loaders import load_scene
    from consistentnerf_tpu.train import loop as loop_lib

    scene = load_scene(cfg)

    if args.bootstrap_priors > 0:
        from consistentnerf_tpu.train.bootstrap import bootstrap_scene_priors

        scene, _ = bootstrap_scene_priors(
            cfg, scene, args.bootstrap_priors,
            export_dir=os.path.join(exp_dir, "bootstrap_priors"),
        )

    random_poses = None
    if cfg.backbone == "mipnerf" and cfg.load_random_rays:
        from consistentnerf_tpu.data.random_poses import generate_random_poses

        random_poses = generate_random_poses(
            scene.poses[scene.i_train],
            n_poses=cfg.n_random_poses,
            pose_type=cfg.random_pose_type,
            radius=cfg.random_pose_radius,
            focusptjitter=cfg.random_pose_focusptjitter,
            add_test_poses=cfg.random_pose_add_test_poses,
            test_poses=scene.poses[scene.i_test],
        )

    result = loop_lib.train(
        cfg, scene, num_steps=args.num_steps, random_poses=random_poses
    )
    print(f"done: {result.rays_per_sec:,.0f} rays/sec")

    if args.eval_after:
        from consistentnerf_tpu.models.factory import make_model
        from consistentnerf_tpu.train.evaluation import evaluate

        model = make_model(cfg)
        metrics = evaluate(
            model,
            cfg,
            result.state.params,
            scene,
            out_dir=os.path.join(exp_dir, "test_preds"),
            step=int(result.state.step),
        )
        print("test metrics:", metrics)


if __name__ == "__main__":
    main()
