#!/bin/bash
# Round-5 chip queue #20: probe31 train-step fix matrix (embed x lse).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue19 complete" results/chip_queue19.log 2>/dev/null; do
  sleep 60
done

for cell in base embed lse both opt_base opt_both; do
  echo "[$(date +%H:%M:%S)] running probe31 $cell"
  timeout 2700 python results/perf_probe31.py $cell >> results/probe31_trainfix.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe31 $cell DONE" || echo "[$(date +%H:%M:%S)] probe31 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue20 complete"
