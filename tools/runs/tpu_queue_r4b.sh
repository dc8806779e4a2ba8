#!/bin/bash
# Round-4 measurement queue B: fixed-sync micros (float() hard sync —
# block_until_ready returned early through the relay and reported >peak
# TFLOPS in queue A), the new one-pass loss-guard rows, the softLp
# fallback cost, a device-op profile, and the driver bench line with the
# new equality guard. ONE TPU process at a time.
cd /root/repo
mkdir -p tools/runs/logs_r4
L=tools/runs/logs_r4
echo "=== B1 chain/matmul roofline micro (fixed sync) $(date)"
timeout 3600 python -u tools/ab_bench.py c_xla c_pallas_t512 c_pallas_t1024 c_pallas_t2048 c_pallas_pe c_pallas_pe2 c_dual_t512 c_dual_t1024 c_quad_t1024 c_quad_t2048 k_matmul > $L/ab_micro_fixed.log 2>&1
echo "=== B2 one-pass loss-guard rows (noise/ssloss/dnoise) $(date)"
timeout 3600 python -u tools/ab_bench.py onepass_t1024_noise onepass_t1024_ssloss mip_onepass_t1024_dnoise > $L/ab_guard_rows.log 2>&1
echo "=== B3 softLp fallback cost $(date)"
timeout 3600 python -u tools/ab_bench.py onepass_t1024 softlp_fused_t1024 softlp_xla > $L/ab_softlp.log 2>&1
echo "=== B4 device-op profile of the one-pass step $(date)"
timeout 1800 python -u tools/profile_step.py onepass_t1024 25 > $L/prof_onepass.log 2>&1
echo "=== B5 driver bench line (with loss guard) $(date)"
timeout 3600 python -u bench.py > $L/bench_guarded.log 2>&1
echo "=== queue B done $(date)"
