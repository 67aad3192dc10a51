#!/bin/bash
cd /root/repo

health() {
  timeout 70 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda a: a@a)(jnp.ones((128,128))).block_until_ready()
" > /dev/null 2>&1
}

run_task() {
  local name=$1 cmd=$2 tmo=$3
  for attempt in 1 2; do
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

run_task probe14_opt "PYTHONUNBUFFERED=1 python results/perf_probe14.py opt" 1500
run_task probe17_kv_int8 "PYTHONUNBUFFERED=1 python results/perf_probe17.py" 1500
run_task probe16_train "PYTHONUNBUFFERED=1 python results/perf_probe16.py" 1500
run_task probe15_stanhop_prefill "PYTHONUNBUFFERED=1 python results/perf_probe15.py" 1500
run_task bench_r3c "python bench.py" 1200
echo "[$(date +%H:%M:%S)] queue5 complete"
run_task probe18_longseq_e2e "PYTHONUNBUFFERED=1 python results/perf_probe18.py" 1500
echo "[$(date +%H:%M:%S)] queue5 complete (incl. probe18)"
