#!/bin/bash
# Round-4 chip queue #9: probe27 remat sweep + probe25 rbg-in-driver check.
# Waits for queue15 (pid $1).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
while kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "[$(date +%H:%M:%S)] running probe26b_scale"
if timeout 3600 python results/perf_probe26b.py > results/probe26b_scale.log 2>&1; then
  echo "[$(date +%H:%M:%S)] probe26b_scale DONE"
else
  echo "[$(date +%H:%M:%S)] probe26b_scale failed/timeout"
fi
echo "[$(date +%H:%M:%S)] queue16 complete"
