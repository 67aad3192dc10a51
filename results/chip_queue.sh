#!/bin/bash
# Opportunistic TPU work queue: waits for the axon tunnel to be healthy, then
# runs each pending task once, sequentially. Logs to results/.
cd /root/repo

health() {
  timeout 70 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda a: a@a)(jnp.ones((128,128))).block_until_ready()
import jax.numpy as jnp
" > /dev/null 2>&1
}

run_task() {  # $1 = name, $2 = command, $3 = timeout secs
  local name=$1 cmd=$2 tmo=$3
  for attempt in 1 2 3 4 5 6 7 8 9 10; do
    if health; then
      echo "[$(date +%H:%M:%S)] running $name (attempt $attempt)"
      if timeout "$tmo" bash -c "$cmd" > "results/${name}.log" 2>&1; then
        echo "[$(date +%H:%M:%S)] $name DONE"
        return 0
      fi
      echo "[$(date +%H:%M:%S)] $name failed/timeout (attempt $attempt)"
    else
      echo "[$(date +%H:%M:%S)] tunnel down, waiting ($name)"
    fi
    sleep 90
  done
  echo "[$(date +%H:%M:%S)] $name GAVE UP"
  return 1
}

run_task bench_r3 "python bench.py" 500
run_task probe10_int8 "PYTHONUNBUFFERED=1 python results/perf_probe10.py bert big" 560
run_task probe11_longseq "PYTHONUNBUFFERED=1 python results/perf_probe11.py" 560
echo "[$(date +%H:%M:%S)] queue complete"
