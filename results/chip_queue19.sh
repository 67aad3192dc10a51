#!/bin/bash
# Round-5 chip queue #19: corrected grad-family breakdown (probe28b) +
# decode write-back scatter fix cells (probe30). Waits for queue18.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue18 complete" results/chip_queue18.log 2>/dev/null; do
  sleep 60
done

echo "[$(date +%H:%M:%S)] running probe28b (fixed grad-family rows)"
timeout 7200 python results/perf_probe28b.py > results/probe28b_breakdown.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] probe28b DONE" || echo "[$(date +%H:%M:%S)] probe28b FAILED"

echo "[$(date +%H:%M:%S)] running probe30 cells"
for cell in full_bf16 full_int8 fwd_bf16 fwd_int8 wb_bf16 small_bf16; do
  timeout 2700 python results/perf_probe30.py $cell >> results/probe30_writeback.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe30 $cell DONE" || echo "[$(date +%H:%M:%S)] probe30 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue19 complete"
