#!/bin/bash
# Driver-round-5 chip queue #37: probe45c — T16384 streaming-bwd train cell
# (max-context extension; XLA cannot compile T8192 already).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo "[$(date +%H:%M:%S)] probe45c train_flash_palbwd_t16384"
timeout 2700 python results/perf_probe45.py train_flash_palbwd_t16384 >> results/probe45c_t16384.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] t16384 DONE" || echo "[$(date +%H:%M:%S)] t16384 FAILED"
echo "[$(date +%H:%M:%S)] queue37 complete"
