#!/bin/bash
# Round-4 queue H: mip/RegNeRF-backbone proof-of-life on the
# capacity-matched scene (regnerf3-style settings: TV-norm random-pose
# patches, near/far annealing, hard masks, density noise — the paper's
# RegNeRF recipe, round-1 POL analog), plus a final same-claim guarded
# bench reading for the round.
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

MIP="$SCENE --set backbone=mipnerf --set mip_num_samples=96 \
 --set mip_num_levels=2 --set N_rand=3072 --set disable_normals=true \
 --set white_bkgd=true --set use_hardmask=true \
 --set depth_tvnorm_loss_mult=0.1 --set depth_tvnorm_decay=true \
 --set depth_tvnorm_maxstep=512 --set depth_tvnorm_loss_mult_start=400.0 \
 --set depth_tvnorm_loss_mult_end=0.1 --set anneal_nearfar=true \
 --set load_random_rays=true \
 --set lr_init=2e-3 --set lr_final=2e-5 --set lr_delay_steps=512 \
 --set lr_delay_mult=0.01 --set grad_max_norm=0.1 --set grad_max_val=0.1 \
 --set density_noise=1.0 --set compute_dtype=bfloat16 \
 --set basedir=/tmp/polh_mip --set expname=mip \
 --set i_print=500 --set checkpoint_every=1500 --set use_tensorboard=false"

echo "=== H1 mip POL $(date)"
rm -rf /tmp/polh_mip
timeout 3500 python -m consistentnerf_tpu.cli.train $MIP \
  --num-steps 3000 > $L/polh_mip.log 2>&1
timeout 2400 python -m consistentnerf_tpu.cli.eval $MIP \
  --set eval_disable_lpips=true >> $L/polh_mip.log 2>&1
echo "=== polh_mip done $(date)"

echo "=== H2 guarded bench $(date)"
timeout 3600 python bench.py > $L/bench_r4_final.log 2>&1
echo "=== queue H done $(date)"
