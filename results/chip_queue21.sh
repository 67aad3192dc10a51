#!/bin/bash
# Round-6 chip queue #21: bench.py headline + probe38 (fused clip+adamw,
# uint8 dropout thresholds) A/B matrix. Waits for the CPU test suite to
# finish first (bench/axon + full pytest can deadlock on libtpu plugin
# registration under CPU oversubscription — CLAUDE.md known flake).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

PYTEST_PID=$(grep -o '[0-9]*' results/pytest_r6_start.pid 2>/dev/null | head -1)
while [ -n "$PYTEST_PID" ] && kill -0 "$PYTEST_PID" 2>/dev/null; do
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

run_task bench_r6 "PYTHONUNBUFFERED=1 python bench.py" 1200
for cell in det_chain det_fused drop_ch32 drop_ch8 drop_fu8; do
  run_task "probe38_${cell}" "PYTHONUNBUFFERED=1 python results/perf_probe38.py ${cell}" 2700
done
for cell in opt_det_chain opt_det_fused opt_drop_ch32 opt_drop_fu8; do
  run_task "probe38_${cell}" "PYTHONUNBUFFERED=1 python results/perf_probe38.py ${cell}" 2700
done
echo "[$(date +%H:%M:%S)] queue21 complete"
