#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
timeout 2700 python results/perf_probe49.py spec_rand >> results/probe50d_debug.log 2>&1
echo "[$(date +%H:%M:%S)] queue43 complete"
