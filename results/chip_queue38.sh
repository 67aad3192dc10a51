#!/bin/bash
# Driver-round-5 chip queue #38: probe49 — speculative serving throughput.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
while ! grep -q "queue37 complete" results/chip_queue37.log 2>/dev/null; do
  sleep 30
done
for cell in plain_rep spec_rep plain_rand spec_rand; do
  echo "[$(date +%H:%M:%S)] probe49 $cell"
  timeout 2700 python results/perf_probe49.py $cell >> results/probe49_spec_serving.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe49 $cell DONE" || echo "[$(date +%H:%M:%S)] probe49 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue38 complete"
