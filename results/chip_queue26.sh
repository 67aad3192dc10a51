#!/bin/bash
# Round-7 chip queue #26: headline bench green-check, then probe42
# (quantized STanHop inference fp32/sim/int8 A/B).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# wait for the CPU test suite (concurrent axon + CPU-oversubscribed pytest
# can deadlock libtpu registration — CLAUDE.md known flake)
while ! grep -qE "passed|failed|error" results/pytest_r7_start.log 2>/dev/null; do
  sleep 30
done

echo "[$(date +%H:%M:%S)] bench.py"
timeout 2700 python bench.py > results/bench_r7.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] bench DONEBENCH" || echo "[$(date +%H:%M:%S)] bench FAILBENCH"
cat results/bench_r7.log | tail -2

for cell in fp32 sim int8; do
  echo "[$(date +%H:%M:%S)] probe42 $cell"
  timeout 2700 python results/perf_probe42.py $cell >> results/probe42_stanhop_int8.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe42 $cell DONE" || echo "[$(date +%H:%M:%S)] probe42 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue26 complete"
