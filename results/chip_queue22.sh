#!/bin/bash
# Round-5 chip queue #22: probe31 OPT cells (lse at 50k vocab).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue21 complete" results/chip_queue21.log 2>/dev/null; do
  sleep 60
done

for cell in opt_base opt_lse; do
  echo "[$(date +%H:%M:%S)] running probe31 $cell"
  timeout 2700 python results/perf_probe31.py $cell >> results/probe31_trainfix.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe31 $cell DONE" || echo "[$(date +%H:%M:%S)] probe31 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue22 complete"
