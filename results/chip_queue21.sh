#!/bin/bash
# Round-5 chip queue #21: dots-policy remat cells + probe20_opt re-measure.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue20 complete" results/chip_queue20.log 2>/dev/null; do
  sleep 60
done

for cell in nobucket_bf16 nobucket_int8; do
  echo "[$(date +%H:%M:%S)] running probe30 $cell"
  timeout 2700 python results/perf_probe30.py $cell >> results/probe30_writeback.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe30 $cell DONE" || echo "[$(date +%H:%M:%S)] probe30 $cell FAILED"
done

for cell in "512 dots" "256 dots"; do
  echo "[$(date +%H:%M:%S)] running probe27 $cell"
  timeout 1800 python results/perf_probe27.py $cell >> results/probe27_remat.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe27 $cell DONE" || echo "[$(date +%H:%M:%S)] probe27 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue21 complete"
