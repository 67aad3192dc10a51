#!/bin/bash
# Driver-round-5 chip queue #41: probe50b — per-slot-normalized adaptive
# fallback: spec_rand should now converge toward plain_rand throughput.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for cell in spec_rand spec_rep; do
  echo "[$(date +%H:%M:%S)] probe50b $cell"
  timeout 2700 python results/perf_probe49.py $cell >> results/probe50b_spec_adaptive.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe50b $cell DONE" || echo "[$(date +%H:%M:%S)] probe50b $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue41 complete"
