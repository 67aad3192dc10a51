#!/bin/bash
# Round-5 chip queue #25: squeezed decode-fast path A/B (after-measurements).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -qE "DONEBENCH|FAILBENCH" results/chip_queue24.log 2>/dev/null; do
  sleep 60
done

echo "[$(date +%H:%M:%S)] probe35 bf16 rerun (squeezed path)"
timeout 3600 python results/perf_probe35.py >> results/probe35_decode_slope.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] probe35-new DONE" || echo "[$(date +%H:%M:%S)] probe35-new FAILED"

for cell in full_bf16 full_int8 small_bf16; do
  echo "[$(date +%H:%M:%S)] probe30 $cell rerun (squeezed path)"
  timeout 2700 python results/perf_probe30.py $cell >> results/probe30_writeback.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe30 $cell DONE" || echo "[$(date +%H:%M:%S)] probe30 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue25 complete"
