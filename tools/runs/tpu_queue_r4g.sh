#!/bin/bash
# Round-4 queue G: proof-of-life on the capacity-matched synthetic scene.
# Queue E established that the flagship 8x256 model memorizes the tiny
# 8-view 64x64 sphere per-view (RUNS_r4.md §5); the scene now scales via
# config. These runs are the round-4 POL: 16 views at 128x128, 4 held-out
# views interleaved through the orbit (45-degree trained neighbors).
#   G1: flagship one-pass megakernel path, N_rand=4096, bf16, 8k steps
#       (the headline: VERDICT r3 item 4).
#   G5: two-call fused path, IDENTICAL recipe (kernel-path convergence
#       cross-check at equal quality-per-step).
#   G2: textured scene (harder bonus row; high-frequency multi-view-
#       consistent content).
#   G3: pol_big N_rand=16384 (decision row: adopt if rays/s lifts at
#       equal quality).
# ONE TPU process at a time.
cd /root/repo
mkdir -p tools/runs/logs_r4
L=tools/runs/logs_r4

for i in $(seq 1 30); do
  if timeout 120 python -c "import jax; print(jax.numpy.zeros(8).sum())" \
      > /dev/null 2>&1; then
    echo "probe ok (attempt $i) $(date)"; break
  fi
  echo "probe failed (attempt $i), sleeping 60s $(date)"; sleep 60
done

SCENE="--set dataset_type=synthetic --set synthetic_views=16 \
 --set synthetic_hw=128 --set synthetic_n_test=4 \
 --set synthetic_interleave_test=true"

BASE="$SCENE --set backbone=vanilla \
 --set N_samples=64 --set N_importance=128 \
 --set n_patches=4 --set patch_size=16 --set hardmask=true \
 --set with_depth_loss=true --set white_bkgd=true \
 --set compute_dtype=bfloat16 \
 --set i_print=500 --set use_tensorboard=false"

run_leg () {  # $1 = tag, $2 = steps, $3 = extra flags
  rm -rf /tmp/polg_$1
  FLAG="$BASE $3 --set basedir=/tmp/polg_$1 --set expname=van \
   --set checkpoint_every=2000"
  timeout 3500 python -m consistentnerf_tpu.cli.train $FLAG \
    --num-steps $2 > $L/polg_$1.log 2>&1
  timeout 2400 python -m consistentnerf_tpu.cli.eval $FLAG \
    --set eval_disable_lpips=true >> $L/polg_$1.log 2>&1
  echo "=== polg_$1 done $(date)"
}

echo "=== G1 flagship one-pass 16x128 $(date)"
run_leg 1op 8000 "--set N_rand=4096"
echo "=== G1 mid-train eval @4000 $(date)"
timeout 2400 python -m consistentnerf_tpu.cli.eval $BASE \
  --set N_rand=4096 --set basedir=/tmp/polg_1op --set expname=van \
  --set eval_disable_lpips=true --step 4000 > $L/polg_1op_s4000.log 2>&1

echo "=== G5 two-call cross-check $(date)"
run_leg 5tc 8000 "--set N_rand=4096 --set use_onepass_train=false"

echo "=== G2 textured $(date)"
run_leg 2tex 8000 "--set N_rand=4096 --set synthetic_texture_freq=6.0"

echo "=== G3 big-batch $(date)"
run_leg 3big 8000 "--set N_rand=16384"

echo "=== queue G done $(date)"
