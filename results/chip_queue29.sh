#!/bin/bash
# Driver-round-5 chip queue #29: probe44 (quantized STanHop re-measure — run
# mode now takes the shared-bank pooling path) + the two-line bench re-run.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue28 complete" results/chip_queue28.log 2>/dev/null; do
  sleep 30
done

for cell in fp32 sim int8; do
  echo "[$(date +%H:%M:%S)] probe44 $cell"
  timeout 2700 python results/perf_probe42.py $cell >> results/probe44_stanhop_int8_shared.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe44 $cell DONE" || echo "[$(date +%H:%M:%S)] probe44 $cell FAILED"
done

echo "[$(date +%H:%M:%S)] bench"
timeout 2700 python bench.py > results/bench_r5.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] bench DONE" || echo "[$(date +%H:%M:%S)] bench FAILED"
echo "[$(date +%H:%M:%S)] queue29 complete"
