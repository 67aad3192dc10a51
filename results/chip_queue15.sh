#!/bin/bash
# Round-4 chip queue #9: probe27 remat sweep + probe25 rbg-in-driver check.
# Waits for queue14 (pid $1).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
while kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "[$(date +%H:%M:%S)] running probe27_remat"
if timeout 5400 python results/perf_probe27.py > results/probe27_remat.log 2>&1; then
  echo "[$(date +%H:%M:%S)] probe27_remat DONE"
else
  echo "[$(date +%H:%M:%S)] probe27_remat failed/timeout"
fi
echo "[$(date +%H:%M:%S)] queue15 complete"
