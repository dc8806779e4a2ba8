#!/bin/bash
# Round-4 queue I: one-pass tile sweep at t512/t768. The round-4 chain
# micro (RUNS_r4.md §4) read the SINGLE trunk chain fastest at t512
# (96.0 TFLOPS vs 91.9 at t1024), but the production one-pass step was
# only ever swept t1024-vs-t2048. Same-claim A/B; t1024 runs first as
# the in-claim baseline, t768 last (untested tile, may not lower).
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

echo "=== I1 vanilla one-pass tile sweep $(date)"
timeout 3600 python tools/ab_bench.py onepass_t1024 onepass_t512 \
  > $L/ab_tile_r4.log 2>&1
echo "=== I2 mip one-pass tile sweep $(date)"
timeout 3600 python tools/ab_bench.py mip_onepass_t1024 mip_onepass_t512 \
  >> $L/ab_tile_r4.log 2>&1
echo "=== I3 t768 probe $(date)"
timeout 1800 python tools/ab_bench.py onepass_t768 \
  >> $L/ab_tile_r4.log 2>&1
echo "=== queue I done $(date)"
