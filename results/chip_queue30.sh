#!/bin/bash
# Driver-round-5 chip queue #30: probe46 — STanHop dec0-shared-STHM A/B +
# encoder/decoder decomposition.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue29 complete" results/chip_queue29.log 2>/dev/null; do
  sleep 30
done

for cell in infer_base infer_dec0 enc_only traind_base traind_dec0; do
  echo "[$(date +%H:%M:%S)] probe46 $cell"
  timeout 2700 python results/perf_probe46.py $cell >> results/probe46_stanhop_dec0.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe46 $cell DONE" || echo "[$(date +%H:%M:%S)] probe46 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue30 complete"
