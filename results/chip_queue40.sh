#!/bin/bash
# Driver-round-5 chip queue #40: probe50 — adaptive speculation fallback:
# spec_rand should converge to ~plain_rand throughput (fallback after the
# probe window), spec_rep keeps its win.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for cell in spec_rand spec_rep; do
  echo "[$(date +%H:%M:%S)] probe50 $cell"
  timeout 2700 python results/perf_probe49.py $cell >> results/probe50_spec_adaptive.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe50 $cell DONE" || echo "[$(date +%H:%M:%S)] probe50 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue40 complete"
