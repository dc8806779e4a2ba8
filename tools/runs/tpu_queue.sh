#!/bin/bash
# Sequential TPU measurement queue (one process at a time), ordered by
# importance in case the claim window is short. Logs in /tmp.
cd /root/repo
echo "=== batch 1 pdf-kernel A/B + big batch $(date)"
timeout 3000 python -u tools/ab_bench.py onepass_t1024 onepass_t1024_nopdfk onepass_big_t1024 > /tmp/ab_b1.log 2>&1
echo "=== batch 2 bench all (driver-format line) $(date)"
timeout 3000 python -u bench.py > /tmp/bench_r3.log 2>&1
echo "=== batch 3 proof-of-life flagship $(date)"
bash tools/runs/pol_flagship.sh > /tmp/pol_r3.log 2>&1
echo "=== batch 4 mip A/B $(date)"
timeout 3000 python -u tools/ab_bench.py mip_onepass_t1024 mip_onepass_t1024_nopdfk mip_onepass_big_t1024 > /tmp/ab_b2.log 2>&1
echo "=== batch 5 render stack A/B $(date)"
timeout 3000 python -u tools/ab_bench.py render_fused_bf16 render_fused_bf16_stack6 render_mip_fused_stack6 > /tmp/ab_b3.log 2>&1
echo "=== batch 6 tile sweep $(date)"
timeout 3000 python -u tools/ab_bench.py onepass_t1024 onepass_t1536 onepass_t1152 > /tmp/ab_b1b.log 2>&1
echo "=== batch 7 profile $(date)"
timeout 1800 python -u tools/profile_step.py onepass_t1024 25 > /tmp/prof_onepass.log 2>&1
echo "=== batch 7b chain/matmul roofline micro $(date)"
timeout 3000 python -u tools/ab_bench.py c_xla c_pallas_t512 c_pallas_t1024 c_pallas_t2048 c_pallas_pe k_matmul > /tmp/ab_chain.log 2>&1
echo "=== batch 8 proof-of-life big batch $(date)"
bash tools/runs/pol_big.sh > /tmp/pol_big.log 2>&1
echo "=== all done $(date)"
