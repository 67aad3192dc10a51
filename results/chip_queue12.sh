#!/bin/bash
# Round-4 chip queue #6: train-MFU adjudication (probe25: dropout PRNG cost)
# + cache-bound decode matrix (probe22b). Waits for queue11 (pid $1).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
while kill -0 "$1" 2>/dev/null; do sleep 60; done

health() {
  timeout 70 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda a: a@a)(jnp.ones((128,128))).block_until_ready()
" > /dev/null 2>&1
}
run_task() {
  local name=$1 cmd=$2 tmo=$3 tries=${4:-2}
  for attempt in $(seq 1 "$tries"); do
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

run_task probe25_rng "PYTHONUNBUFFERED=1 python results/perf_probe25.py" 2700
run_task probe22b_bigcache "PYTHONUNBUFFERED=1 python results/perf_probe22b.py" 2700
echo "[$(date +%H:%M:%S)] queue12 complete"
