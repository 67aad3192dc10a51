#!/bin/bash
# Driver-round-5 chip queue #39: probe49b — spec serving re-measure with the
# multi-token decode_fast verify (scores concat instead of KV-cache concat).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
while ! grep -q "queue38 complete" results/chip_queue38.log 2>/dev/null; do
  sleep 30
done
for cell in spec_rep spec_rand; do
  echo "[$(date +%H:%M:%S)] probe49b $cell"
  timeout 2700 python results/perf_probe49.py $cell >> results/probe49b_spec_fast.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe49b $cell DONE" || echo "[$(date +%H:%M:%S)] probe49b $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue39 complete"
