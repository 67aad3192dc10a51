#!/bin/bash
# Driver-round-5 chip queue #42: probe50c — break-even threshold 1.4:
# spec_rand must now fall back and recover to ~plain_rand throughput.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for cell in spec_rand spec_rep; do
  echo "[$(date +%H:%M:%S)] probe50c $cell"
  timeout 2700 python results/perf_probe49.py $cell >> results/probe50c_spec_adaptive.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe50c $cell DONE" || echo "[$(date +%H:%M:%S)] probe50c $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue42 complete"
