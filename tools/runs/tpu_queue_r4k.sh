#!/bin/bash
# Round-4 queue K: mip POL, attempt 3 — via the synthetic_pol_mip preset.
# J2 diverged (loss oscillating 0.1<->1.0 from step 750) because the raw
# flag set left total_iters at the 50000 default (lr pinned at lr_init
# 2e-3 for the whole 3k-step run; RegNeRF decays it to 2e-5 across
# total_iters) and the near/far anneal at the 2000-step/mid-0.5 defaults
# (sampling squeezed to mid-depth for 2/3 of training). The preset pins
# total_iters=3000 + the regnerf3/nerf grid anneal (256 steps, mid 1.0).
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

FLAG="--scene synthetic_pol_mip \
 --set basedir=/tmp/polk_mip --set expname=mip \
 --set i_print=250 --set checkpoint_every=1500 --set use_tensorboard=false"

echo "=== K1 mip POL via preset $(date)"
rm -rf /tmp/polk_mip
timeout 3500 python -m consistentnerf_tpu.cli.train $FLAG \
  --num-steps 3000 > $L/polk_mip.log 2>&1
timeout 2400 python -m consistentnerf_tpu.cli.eval $FLAG \
  --set eval_disable_lpips=true >> $L/polk_mip.log 2>&1
echo "=== polk_mip done $(date)"
echo "=== queue K done $(date)"
