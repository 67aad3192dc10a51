#!/bin/bash
# Driver-round-5 chip queue #32: dbias-slab on-chip coverage (gradcheck_bias).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue31 complete" results/chip_queue31.log 2>/dev/null; do
  sleep 30
done

echo "[$(date +%H:%M:%S)] probe45 gradcheck_bias"
timeout 2700 python results/perf_probe45.py gradcheck_bias >> results/probe45_longseq_train.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] gradcheck_bias DONE" || echo "[$(date +%H:%M:%S)] gradcheck_bias FAILED"
echo "[$(date +%H:%M:%S)] queue32 complete"
