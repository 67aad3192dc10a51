#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

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

run_task probe13_int8_e2e "PYTHONUNBUFFERED=1 python results/perf_probe13.py" 1200
run_task probe14_e2e_flash "PYTHONUNBUFFERED=1 python results/perf_probe14.py" 1200
run_task probe15_stanhop_prefill "PYTHONUNBUFFERED=1 python results/perf_probe15.py" 1200
run_task bench_r3c "python bench.py" 900
echo "[$(date +%H:%M:%S)] queue4 complete"
run_task probe16_train "PYTHONUNBUFFERED=1 python results/perf_probe16.py" 1200
echo "[$(date +%H:%M:%S)] queue4 complete (incl. appended probe16)"
run_task probe17_kv_int8 "PYTHONUNBUFFERED=1 python results/perf_probe17.py" 1200
echo "[$(date +%H:%M:%S)] queue4 complete (incl. probe17)"
