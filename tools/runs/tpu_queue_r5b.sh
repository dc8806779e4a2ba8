#!/bin/bash
# Round-5 queue B: eval-throughput attribution (VERDICT item 6) + mip
# early-oscillation probes (item 2) + final guarded bench.
# ONE TPU process at a time — launch only after queue A exits.
cd /root/repo
mkdir -p tools/runs/logs_r5
L=tools/runs/logs_r5

for i in $(seq 1 40); do
  if timeout 360 python -c "import jax; print(jax.numpy.zeros(8).sum())" \
      > /dev/null 2>&1; then
    echo "probe ok (attempt $i) $(date)"; break
  fi
  echo "probe failed (attempt $i), sleeping 120s $(date)"; sleep 120
done

# B1: eval dispatch-group sweep. 8 held-out views at 128px, random init
# (throughput only), LPIPS off, images off. g=1 is the round-4 per-view
# baseline semantics; g=2/4 the stacked path.
EV="--scene synthetic_pol --set synthetic_n_test=8 --set basedir=/tmp/r5_evalsweep \
 --set eval_disable_lpips=true --set eval_save_output=false \
 --set use_tensorboard=false"
for g in 1 2 4; do
  echo "=== evalsweep g=$g $(date)"
  timeout 1800 python -m consistentnerf_tpu.cli.eval $EV \
    --set expname=ev_g$g --set eval_views_per_call=$g \
    > $L/evalsweep_g$g.log 2>&1
done
echo "=== evalsweep done $(date)"

# B2: mip early-oscillation probes (2k steps each, fine-grained prints).
# Control + one-axis-at-a-time: lr peak, TV-norm start weight, density
# noise. RegNeRF/train.py:256-271 clips grads the same way the preset
# does, so the suspects are the loss/schedule magnitudes.
MIPB="--scene synthetic_pol_mip --set basedir=/tmp/r5_mipprobe \
 --set total_iters=2000 --set anneal_nearfar_steps=256 --set i_print=100 \
 --set checkpoint_every=4000 --set use_tensorboard=false"
run_probe () {
  local name=$1; shift
  echo "=== mip probe $name $(date)"
  rm -rf /tmp/r5_mipprobe
  timeout 1800 python -m consistentnerf_tpu.cli.train $MIPB \
    --set expname=$name $@ --num-steps 2000 > $L/mipprobe_$name.log 2>&1
}
run_probe m_base
run_probe m_lr1e3 --set lr_init=1e-3
run_probe m_tv40 --set depth_tvnorm_loss_mult_start=40.0
run_probe m_nonoise --set density_noise=0.0
echo "=== mip probes done $(date)"

# B3: final guarded driver-format bench.
echo "=== bench $(date)"
timeout 3600 python bench.py > $L/bench_r5.log 2>&1
tail -1 $L/bench_r5.log
echo "=== queue B done $(date)"
