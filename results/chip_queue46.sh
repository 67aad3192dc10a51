#!/bin/bash
# Driver-round-5 chip queue #46: probe52 — spec-step program cost.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for cell in plain_step spec_step; do
  echo "[$(date +%H:%M:%S)] probe52 $cell"
  timeout 2700 python results/perf_probe52.py $cell >> results/probe52_spec_cost.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe52 $cell DONE" || echo "[$(date +%H:%M:%S)] probe52 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue46 complete"
