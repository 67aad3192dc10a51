#!/bin/bash
# Driver-round-5 chip queue #47: probe53 — serving re-measure with
# 128-granularity buckets (probe52 fix).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
for cell in plain_rep spec7_rep spec_rand plain_rand; do
  echo "[$(date +%H:%M:%S)] probe53 $cell"
  timeout 2700 python results/perf_probe49.py $cell >> results/probe53_bucket128.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe53 $cell DONE" || echo "[$(date +%H:%M:%S)] probe53 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue47 complete"
