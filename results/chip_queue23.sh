#!/bin/bash
# Round-5 chip queue #23: realistic train config row (probe34).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue22 complete" results/chip_queue22.log 2>/dev/null; do
  sleep 60
done

echo "[$(date +%H:%M:%S)] running probe34"
timeout 2700 python results/perf_probe34.py > results/probe34_train_rbg.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] probe34 DONE" || echo "[$(date +%H:%M:%S)] probe34 FAILED"
echo "[$(date +%H:%M:%S)] queue23 complete"
