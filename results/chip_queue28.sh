#!/bin/bash
# Driver-round-5 chip queue #28: probe45 — long-seq flash training adjudication.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

for cell in gradcheck train_xla train_flash_xlabwd train_flash_palbwd; do
  echo "[$(date +%H:%M:%S)] probe45 $cell"
  timeout 2700 python results/perf_probe45.py $cell >> results/probe45_longseq_train.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe45 $cell DONE" || echo "[$(date +%H:%M:%S)] probe45 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue28 complete"
