#!/bin/bash
# Driver-round-5 chip queue #31: probe45b — long-seq train at the memory-
# capacity regime (T4096/T8192 B1): does XLA autodiff OOM where the
# streaming Pallas backward still trains?
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue30 complete" results/chip_queue30.log 2>/dev/null; do
  sleep 30
done

for cell in train_xla_t4096 train_flash_palbwd_t4096 train_xla_t8192 train_flash_palbwd_t8192; do
  echo "[$(date +%H:%M:%S)] probe45b $cell"
  timeout 2700 python results/perf_probe45.py $cell >> results/probe45b_longseq_capacity.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe45b $cell DONE" || echo "[$(date +%H:%M:%S)] probe45b $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue31 complete"
