#!/bin/bash
# Driver-round-5 chip queue #44: probe51 — spec_k sweep (2/7) + repeat
# baseline cells to bound the wall-clock noise band.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for cell in spec7_rep spec2_rep plain_rep spec7_rand; do
  echo "[$(date +%H:%M:%S)] probe51 $cell"
  timeout 2700 python results/perf_probe49.py $cell >> results/probe51_speck_sweep.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe51 $cell DONE" || echo "[$(date +%H:%M:%S)] probe51 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue44 complete"
