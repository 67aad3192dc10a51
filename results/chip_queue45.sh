#!/bin/bash
# Driver-round-5 chip queue #45: third bench sample (guard-band bounding).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
timeout 2700 python bench.py > results/bench_r5_sample3.log 2>&1
echo "[$(date +%H:%M:%S)] queue45 complete"
