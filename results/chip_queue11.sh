#!/bin/bash
# Round-4 chip queue #5: rerun of the queue8 tail that died when the session
# restarted mid-probe23, with the two fixes since committed (packed-bwd
# bias/no-dbias arity 2953be1; decode-kernel VPU matvec c5140f5).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

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

# packed Pallas backward e2e (ViT train) — rerun with the arity fix
run_task probe21_train_vit "PYTHONUNBUFFERED=1 python results/perf_probe21.py vit" 2700
# fused decode kernel matrix (int8-KV adjudication) — rerun with the VPU fix
run_task probe22_decode "PYTHONUNBUFFERED=1 python results/perf_probe22.py" 2700
# host-boundary fixes on chip (telemetry eval + MSE freeze)
run_task probe24_host "PYTHONUNBUFFERED=1 python results/perf_probe24.py" 2700
# in-model Mosaic crash bisect (one process per variant; SIGABRT = trigger)
run_task probe23_standalone "PYTHONUNBUFFERED=1 python results/perf_probe23.py standalone" 1200 1
run_task probe23_scan "PYTHONUNBUFFERED=1 python results/perf_probe23.py scan" 1200 1
run_task probe23_dense "PYTHONUNBUFFERED=1 python results/perf_probe23.py dense" 1200 1
run_task probe23_layer "PYTHONUNBUFFERED=1 python results/perf_probe23.py layer" 1200 1
run_task probe23_model2 "PYTHONUNBUFFERED=1 python results/perf_probe23.py model2" 1200 1
# train steps (OPT causal rows now XLA-dispatch parity)
run_task probe21_train_opt "PYTHONUNBUFFERED=1 python results/perf_probe21.py opt" 2700
run_task probe21_train_bert "PYTHONUNBUFFERED=1 python results/perf_probe21.py bert" 2700
# headline bench
run_task bench_r4 "python bench.py" 1800
# gated-OPT e2e rerun (flash row must be parity-by-dispatch, no crash)
run_task probe14_opt_r4b "PYTHONUNBUFFERED=1 python results/perf_probe14.py opt" 2700
run_task probe20_opt_r4 "PYTHONUNBUFFERED=1 python results/perf_probe20.py opt" 2700
echo "[$(date +%H:%M:%S)] queue11 complete"
