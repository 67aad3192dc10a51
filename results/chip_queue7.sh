#!/bin/bash
# Round-4 chip queue #2: fused decode kernel matrix (probe22 — the int8-KV
# adjudication), plus retries of anything queue6 gave up on. Waits for
# queue6 to finish (only ONE process may own the chip).
cd /root/repo

while pgrep -x -f "bash results/chip_queue6.sh" > /dev/null 2>&1; do sleep 60; done

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

# bisect the in-model Mosaic crash (probe14_opt_r4): each variant compiles one
# composition in its own process; SIGABRT = that composition is the trigger
run_task probe23_standalone "PYTHONUNBUFFERED=1 python results/perf_probe23.py standalone" 900 1
run_task probe23_scan "PYTHONUNBUFFERED=1 python results/perf_probe23.py scan" 900 1
run_task probe23_dense "PYTHONUNBUFFERED=1 python results/perf_probe23.py dense" 900 1
run_task probe23_layer "PYTHONUNBUFFERED=1 python results/perf_probe23.py layer" 900 1
run_task probe23_model2 "PYTHONUNBUFFERED=1 python results/perf_probe23.py model2" 900 1
run_task probe22_decode "PYTHONUNBUFFERED=1 python results/perf_probe22.py" 2400
run_task probe21_train_vit "PYTHONUNBUFFERED=1 python results/perf_probe21.py vit" 2400
# with the causal-aware gate, OPT T512 use_flash=True must now dispatch XLA
# (parity row, no crash): rerun probe14 opt to record it
run_task probe14_opt_r4b "PYTHONUNBUFFERED=1 python results/perf_probe14.py opt" 2400
echo "[$(date +%H:%M:%S)] queue7 complete"
