#!/bin/bash
# Driver-round-5 chip queue #36: probe48 — block-diag association A/B.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for cell in base_infer bd_infer base_traind bd_traind; do
  echo "[$(date +%H:%M:%S)] probe48 $cell"
  timeout 2700 python results/perf_probe48.py $cell >> results/probe48_blockdiag.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe48 $cell DONE" || echo "[$(date +%H:%M:%S)] probe48 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue36 complete"
