#!/bin/bash
# Round-4 chip queue #7: probe26 bias-broadcast bisect/fix matrix.
# Waits for queue13 (pid $1).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
while kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "[$(date +%H:%M:%S)] running probe24_v2"
if timeout 4200 python results/perf_probe24.py > results/probe24_v2.log 2>&1; then
  echo "[$(date +%H:%M:%S)] probe24_v2 DONE"
else
  echo "[$(date +%H:%M:%S)] probe24_v2 failed/timeout"
fi
echo "[$(date +%H:%M:%S)] queue14 complete"
