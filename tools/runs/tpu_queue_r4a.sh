#!/bin/bash
# Round-4 measurement queue A (existing variants only — safe to run
# while ab_bench gains new variants for queue B). ONE TPU process at a
# time; logs are committable under tools/runs/logs_r4/.
cd /root/repo
mkdir -p tools/runs/logs_r4
L=tools/runs/logs_r4
echo "=== batch 1 pdf-kernel A/B + loss guards $(date)"
timeout 3600 python -u tools/ab_bench.py onepass_t1024 onepass_t1024_nopdfk onepass_big_t1024 onepass_big_t1024_nopdfk > $L/ab_pdf.log 2>&1
echo "=== batch 2 chain/matmul roofline micro $(date)"
timeout 3600 python -u tools/ab_bench.py c_xla c_pallas_t512 c_pallas_t1024 c_pallas_t2048 c_pallas_pe k_matmul > $L/ab_micro.log 2>&1
echo "=== batch 3 mip pdf A/B $(date)"
timeout 3600 python -u tools/ab_bench.py mip_onepass_t1024 mip_onepass_t1024_nopdfk mip_onepass_big_t1024 > $L/ab_mip.log 2>&1
echo "=== batch 4 proof-of-life flagship $(date)"
bash tools/runs/pol_flagship.sh > $L/pol_flagship.log 2>&1
echo "=== batch 5 proof-of-life big batch $(date)"
bash tools/runs/pol_big.sh > $L/pol_big.log 2>&1
echo "=== queue A done $(date)"
