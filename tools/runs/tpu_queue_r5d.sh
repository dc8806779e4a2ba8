#!/bin/bash
# Round-5 queue D: the probe-identified mip fix at the full 8k schedule
# (lr_init=1e-3 — m_lr1e3 read 25.23/0.925 at 2k of the 8k horizon while
# the 2e-3 control collapsed), then the final guarded driver bench.
# ONE TPU process at a time: waits for queue C's pid before starting.
cd /root/repo
mkdir -p tools/runs/logs_r5
L=tools/runs/logs_r5

if [ -f /tmp/r5c.pid ]; then
  PID=$(cat /tmp/r5c.pid)
  while kill -0 "$PID" 2>/dev/null; do
    echo "waiting on queue C (pid $PID) $(date)"; sleep 60
  done
fi
echo "queue C done, starting D $(date)"

timeout 3000 python tools/runs/ablate_r5.py pol_mip_8k_lr1e3 \
  >> $L/queue_r5d.log 2>&1

echo "=== bench $(date)"
timeout 3600 python bench.py > $L/bench_r5.log 2>&1
tail -1 $L/bench_r5.log
echo "=== queue D done $(date)"
