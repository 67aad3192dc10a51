#!/bin/bash
# Round-4 chip queue #7: probe26 bias-broadcast bisect/fix matrix.
# Waits for queue12 (pid $1).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
while kill -0 "$1" 2>/dev/null; do sleep 60; done
echo "[$(date +%H:%M:%S)] running probe26_matrix"
if timeout 4200 python results/perf_probe26.py > results/probe26_matrix.log 2>&1; then
  echo "[$(date +%H:%M:%S)] probe26_matrix DONE"
else
  echo "[$(date +%H:%M:%S)] probe26_matrix failed/timeout"
fi
echo "[$(date +%H:%M:%S)] queue13 complete"
