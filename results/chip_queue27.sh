#!/bin/bash
# Round-7 chip queue #27: probe43 — STanHop pooling shared-bank restructure A/B.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue26 complete" results/chip_queue26.log 2>/dev/null; do
  sleep 30
done

for cell in base_train shared_train base_infer shared_infer; do
  echo "[$(date +%H:%M:%S)] probe43 $cell"
  timeout 2700 python results/perf_probe43.py $cell >> results/probe43_pool_shared.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe43 $cell DONE" || echo "[$(date +%H:%M:%S)] probe43 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue27 complete"
