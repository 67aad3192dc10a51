#!/bin/bash
# Round-6 chip queue #24: probe41 STanHop trim A/B matrix.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

while ! grep -q "queue23 complete" results/chip_queue23.log 2>/dev/null; do
  sleep 30
done

health() {
  timeout 70 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda a: a@a)(jnp.ones((128,128))).block_until_ready()
" > /dev/null 2>&1
}

run_task() {
  local name=$1 cmd=$2 tmo=$3
  for attempt in 1 2 3; do
    if health; then
      echo "[$(date +%H:%M:%S)] running $name (attempt $attempt)"
      if timeout "$tmo" bash -c "$cmd" > "results/${name}.log" 2>&1; then
        echo "[$(date +%H:%M:%S)] $name DONE"; return 0
      fi
      echo "[$(date +%H:%M:%S)] $name failed/timeout (attempt $attempt)"
    else
      echo "[$(date +%H:%M:%S)] tunnel down, waiting ($name)"
    fi
    sleep 60
  done
  echo "[$(date +%H:%M:%S)] $name GAVE UP"; return 1
}

for cell in base both qk kv; do
  run_task "probe41_${cell}" "PYTHONUNBUFFERED=1 python results/perf_probe41.py ${cell}" 2700
done
echo "[$(date +%H:%M:%S)] queue24 complete"
