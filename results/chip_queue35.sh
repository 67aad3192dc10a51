#!/bin/bash
# Driver-round-5 chip queue #35: probe47 — encoder sublayer decomposition.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue34 complete" results/chip_queue34.log 2>/dev/null; do
  sleep 30
done

for cell in enc1 enc2 enc3 sthm0 ct0 cs0 mlp0; do
  echo "[$(date +%H:%M:%S)] probe47 $cell"
  timeout 2700 python results/perf_probe47.py $cell >> results/probe47_enc_decomp.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe47 $cell DONE" || echo "[$(date +%H:%M:%S)] probe47 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue35 complete"
