#!/bin/bash
# Probe the TPU; the moment a claim succeeds, run the queued measurement
# batches (/root/repo/tools/runs/tpu_queue.sh). Each failed claim attempt errors on its
# own (~30 min when the pool is down); probes and the queue never
# overlap (one TPU process at a time).
for i in $(seq 1 40); do
  echo "=== probe $i $(date)" >> /tmp/tpu_probe.log
  if timeout 2400 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; print('TPU OK')" >> /tmp/tpu_probe.log 2>&1; then
    echo "=== AVAILABLE $(date)" >> /tmp/tpu_probe.log
    bash /root/repo/tools/runs/tpu_queue.sh >> /tmp/tpu_queue_run.log 2>&1
    echo "=== QUEUE DONE $(date)" >> /tmp/tpu_probe.log
    exit 0
  fi
  sleep 240
done
echo "=== gave up $(date)" >> /tmp/tpu_probe.log
