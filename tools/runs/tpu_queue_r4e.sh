#!/bin/bash
# Round-4 queue E: isolate the interleaved-POL quality collapse.
# Queue D's first pass was double-launched (a stale watcher from the
# previous session fired next to the new one) and its numbers are void;
# a clean CPU re-eval of the surviving checkpoint showed train views at
# PSNR 34-39 but held-out view 7 rendering PURE WHITE — training fits,
# novel-view generalization collapsed (round 2 measured 21.8 on this
# exact split). These legs discriminate kernel-backward vs shared-recipe:
#   E1 traj_*: N deterministic steps of kernel step vs XLA step from the
#      same init — a miscompiled custom-VJP bends the trajectory.
#   E2/E3/E4: the same flagship recipe trained via one-pass / two-call /
#      pure-XLA; if ALL read ~10 PSNR the regression is in the shared
#      path (losses/masks/schedule), not the kernels.
# ONE TPU process at a time.
cd /root/repo
mkdir -p tools/runs/logs_r4
L=tools/runs/logs_r4

for i in $(seq 1 20); do
  if timeout 120 python -c "import jax; print(jax.numpy.zeros(8).sum())" \
      > /dev/null 2>&1; then
    echo "probe ok (attempt $i) $(date)"; break
  fi
  echo "probe failed (attempt $i), sleeping 60s $(date)"; sleep 60
done

echo "=== E1 trajectory check (hardware backward truth) $(date)"
timeout 3600 python -u tools/ab_bench.py traj_onepass traj_fused \
  > $L/ab_traj.log 2>&1

run_pol () {  # $1 = tag, $2 = extra flags
  rm -rf /tmp/pole_$1
  FLAG="--set dataset_type=synthetic --set backbone=vanilla \
   --set N_samples=64 --set N_importance=128 --set N_rand=4096 \
   --set n_patches=4 --set patch_size=16 --set hardmask=true \
   --set with_depth_loss=true --set white_bkgd=true \
   --set synthetic_interleave_test=true \
   --set compute_dtype=bfloat16 $2 \
   --set basedir=/tmp/pole_$1 --set expname=van \
   --set i_print=400 --set checkpoint_every=2000 --set use_tensorboard=false"
  timeout 3500 python -m consistentnerf_tpu.cli.train $FLAG \
    --num-steps 4000 > $L/pole_$1.log 2>&1
  timeout 1800 python -m consistentnerf_tpu.cli.eval $FLAG \
    --set eval_disable_lpips=true >> $L/pole_$1.log 2>&1
  echo "=== pole_$1 done $(date)"
}

echo "=== E2 one-pass POL $(date)"
run_pol op ""
echo "=== E3 two-call POL $(date)"
run_pol tc "--set use_onepass_train=false"
echo "=== E4 pure-XLA POL $(date)"
run_pol xla "--set use_onepass_train=false --set use_fused_train=false"
echo "=== queue E done $(date)"
