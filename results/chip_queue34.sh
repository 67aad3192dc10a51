#!/bin/bash
# Driver-round-5 chip queue #34: final bench re-run with the drift-immune
# guard (vs_xla same-run ratio added after the probe20-rerun adjudication).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue33 complete" results/chip_queue33.log 2>/dev/null; do
  sleep 30
done

echo "[$(date +%H:%M:%S)] bench final"
timeout 2700 python bench.py > results/bench_r5_final.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] bench final DONE" || echo "[$(date +%H:%M:%S)] bench final FAILED"
echo "[$(date +%H:%M:%S)] queue34 complete"
