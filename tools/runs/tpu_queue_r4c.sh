#!/bin/bash
# Round-4 queue C: resume after the session restart killed queue A at
# batch 4 (pol_flagship died at step 2800/4000; partial log preserved as
# pol_flagship_partial.log). Re-runs both proof-of-life runs from
# scratch, then everything from queue B. ONE TPU process at a time.
cd /root/repo
mkdir -p tools/runs/logs_r4
L=tools/runs/logs_r4

# The previous process died mid-claim ~minutes ago; the grant can wedge
# briefly. Probe until a trivial device op succeeds (max ~20 min).
for i in $(seq 1 20); do
  if timeout 120 python -c "import jax; print(jax.numpy.zeros(8).sum())" \
      > /dev/null 2>&1; then
    echo "probe ok (attempt $i) $(date)"; break
  fi
  echo "probe failed (attempt $i), sleeping 60s $(date)"; sleep 60
done

echo "=== C1 proof-of-life flagship (rerun) $(date)"
bash tools/runs/pol_flagship.sh > $L/pol_flagship.log 2>&1
echo "=== C2 proof-of-life big batch $(date)"
bash tools/runs/pol_big.sh > $L/pol_big.log 2>&1
echo "=== C3 chain/matmul roofline micro (fixed sync) $(date)"
timeout 3600 python -u tools/ab_bench.py c_xla c_pallas_t512 c_pallas_t1024 c_pallas_t2048 c_pallas_pe c_pallas_pe2 c_dual_t512 c_dual_t1024 c_quad_t1024 c_quad_t2048 k_matmul > $L/ab_micro_fixed.log 2>&1
echo "=== C4 one-pass loss-guard rows (noise/ssloss/dnoise) $(date)"
timeout 3600 python -u tools/ab_bench.py onepass_t1024_noise onepass_t1024_ssloss mip_onepass_t1024_dnoise > $L/ab_guard_rows.log 2>&1
echo "=== C5 softLp fallback cost $(date)"
timeout 3600 python -u tools/ab_bench.py onepass_t1024 softlp_fused_t1024 softlp_xla > $L/ab_softlp.log 2>&1
echo "=== C6 device-op profile of the one-pass step $(date)"
timeout 1800 python -u tools/profile_step.py onepass_t1024 25 > $L/prof_onepass.log 2>&1
echo "=== C7 driver bench line (with loss guard) $(date)"
timeout 3600 python -u bench.py > $L/bench_guarded.log 2>&1
echo "=== queue C done $(date)"
