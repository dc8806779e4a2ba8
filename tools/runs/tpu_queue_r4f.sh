#!/bin/bash
# Round-4 queue F: bisect the interleaved-POL quality collapse.
# Facts so far (queue E + CPU run A):
#   - one-pass / two-call / pure-XLA at flagship scale ALL collapse
#     (held-out PSNR 10.4 / 14.2 / 8.1; train PSNR 36-42) => shared
#     recipe, not kernels.
#   - a scaled-down CPU run of the same recipe (net 4x128, 32c+64f,
#     N_rand=1024, fp32, 1500 steps) is HEALTHY: 20.96 / 0.774.
# These legs vary ONE axis at a time off the collapsed E4 (pure-XLA
# bf16 flagship) configuration to find which axis causes it.
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

BASE="--set dataset_type=synthetic --set backbone=vanilla \
 --set n_patches=4 --set patch_size=16 --set hardmask=true \
 --set with_depth_loss=true --set white_bkgd=true \
 --set synthetic_interleave_test=true \
 --set i_print=400 --set use_tensorboard=false"

# F0: eval the EXISTING queue-E checkpoints at step 2000 (progressive
# overfit vs structural: PSNR still climbing at 2400 in the train logs).
echo "=== F0a eval pole_op @2000 $(date)"
timeout 1800 python -m consistentnerf_tpu.cli.eval $BASE \
  --set N_samples=64 --set N_importance=128 --set N_rand=4096 \
  --set compute_dtype=bfloat16 \
  --set basedir=/tmp/pole_op --set expname=van \
  --set eval_disable_lpips=true --step 2000 > $L/polf_0a_op2000.log 2>&1
echo "=== F0b eval pole_xla @2000 $(date)"
timeout 1800 python -m consistentnerf_tpu.cli.eval $BASE \
  --set N_samples=64 --set N_importance=128 --set N_rand=4096 \
  --set compute_dtype=bfloat16 \
  --set use_onepass_train=false --set use_fused_train=false \
  --set basedir=/tmp/pole_xla --set expname=van \
  --set eval_disable_lpips=true --step 2000 > $L/polf_0b_xla2000.log 2>&1

run_leg () {  # $1 = tag, $2 = steps, $3 = extra flags
  rm -rf /tmp/polf_$1
  FLAG="$BASE $3 --set basedir=/tmp/polf_$1 --set expname=van \
   --set checkpoint_every=1000"
  timeout 3500 python -m consistentnerf_tpu.cli.train $FLAG \
    --num-steps $2 > $L/polf_$1.log 2>&1
  timeout 1800 python -m consistentnerf_tpu.cli.eval $FLAG \
    --set eval_disable_lpips=true >> $L/polf_$1.log 2>&1
  echo "=== polf_$1 done $(date)"
}

FLAG_FLAGSHIP="--set N_samples=64 --set N_importance=128 --set N_rand=4096 \
 --set use_onepass_train=false --set use_fused_train=false"

# F6: the HEALTHY CPU recipe verbatim on TPU (backend axis).
echo "=== F6 cpu-recipe-on-tpu $(date)"
run_leg 6cpu 1500 "--set netdepth=4 --set netwidth=128 \
 --set netdepth_fine=4 --set netwidth_fine=128 \
 --set N_samples=32 --set N_importance=64 --set N_rand=1024 \
 --set compute_dtype=float32 \
 --set use_onepass_train=false --set use_fused_train=false"

# F2: small net at otherwise-flagship scale (capacity axis).
echo "=== F2 small-net $(date)"
run_leg 2small 4000 "$FLAG_FLAGSHIP --set compute_dtype=bfloat16 \
 --set netdepth=4 --set netwidth=128 \
 --set netdepth_fine=4 --set netwidth_fine=128"

# F1: flagship in fp32 (precision axis).
echo "=== F1 fp32 $(date)"
run_leg 1fp32 4000 "$FLAG_FLAGSHIP --set compute_dtype=float32"

# F3: flagship without patch terms (patch-loss axis).
echo "=== F3 no-patches $(date)"
run_leg 3nopatch 4000 "$FLAG_FLAGSHIP --set compute_dtype=bfloat16 \
 --set n_patches=0"

# F5: flagship at N_rand=1024 (batch-size axis; CPU-A used 1024).
echo "=== F5 nrand1024 $(date)"
run_leg 5nr1024 4000 "--set N_samples=64 --set N_importance=128 \
 --set N_rand=1024 --set compute_dtype=bfloat16 \
 --set use_onepass_train=false --set use_fused_train=false"

# F4: flagship at 32c+64f samples (sample-count axis).
echo "=== F4 samples32-64 $(date)"
run_leg 4s3264 4000 "--set N_samples=32 --set N_importance=64 \
 --set N_rand=4096 --set compute_dtype=bfloat16 \
 --set use_onepass_train=false --set use_fused_train=false"

echo "=== queue F done $(date)"
