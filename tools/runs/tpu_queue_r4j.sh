#!/bin/bash
# Round-4 queue J: diagnose + redo the mip POL.
# Queue H's mip POL (H1) ran at ~1.4k rays/s — two orders below the
# bench_mip rate. Found host-side: _random_pose_patch_rays built FULL
# [H, W] jnp ray images per 8x8 patch (256x wasted work + a device
# dispatch per patch) — fixed to window-local numpy (163 ms -> 2.6 ms
# per batch at the POL scene size). J1 A/Bs the exact H1 step class on
# hardware (tvnorm random rays + anneal) to see what the DEVICE step
# costs; J2 reruns the mip POL on the fixed pipeline.
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

echo "=== J1 mip tvnorm step A/B $(date)"
timeout 3600 python tools/ab_bench.py mip_onepass_tvnorm mip_xla_tvnorm \
  > $L/ab_mip_tvnorm.log 2>&1

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
 --set basedir=/tmp/polj_mip --set expname=mip \
 --set i_print=250 --set checkpoint_every=1500 --set use_tensorboard=false"

echo "=== J2 mip POL rerun $(date)"
rm -rf /tmp/polj_mip
timeout 3500 python -m consistentnerf_tpu.cli.train $MIP \
  --num-steps 3000 > $L/polj_mip.log 2>&1
timeout 2400 python -m consistentnerf_tpu.cli.eval $MIP \
  --set eval_disable_lpips=true >> $L/polj_mip.log 2>&1
echo "=== polj_mip done $(date)"
echo "=== queue J done $(date)"
