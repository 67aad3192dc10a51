#!/bin/bash
# Round-4 chip queue #1: crash-fix validation (probe19), e2e flash reruns
# (probe14 — ViT/OPT now routed through the packed kernel), long-seq e2e
# (probe18), fused clipped epilogue e2e (probe20), train-with-flash (probe21),
# headline bench; the expected-SIGABRT root-cause confirmation runs LAST.
cd /root/repo

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

run_task probe19_new "PYTHONUNBUFFERED=1 python results/perf_probe19.py new" 1500
run_task probe14_opt_r4 "PYTHONUNBUFFERED=1 python results/perf_probe14.py opt" 1500
run_task probe14_vit_r4 "PYTHONUNBUFFERED=1 python results/perf_probe14.py vit" 1500
run_task probe18_longseq_e2e "PYTHONUNBUFFERED=1 python results/perf_probe18.py" 1500
run_task probe20_clipped_bert "PYTHONUNBUFFERED=1 python results/perf_probe20.py bert" 1500
run_task probe20_clipped_opt "PYTHONUNBUFFERED=1 python results/perf_probe20.py opt" 1500
run_task probe21_train_opt "PYTHONUNBUFFERED=1 python results/perf_probe21.py opt" 1500
run_task probe21_train_bert "PYTHONUNBUFFERED=1 python results/perf_probe21.py bert" 1500
run_task bench_r4 "python bench.py" 1200
# EXPECTED to SIGABRT (root-cause confirmation of the round-3 Mosaic crash);
# one attempt, failure is the expected outcome
run_task probe19_oldstyle "PYTHONUNBUFFERED=1 python results/perf_probe19.py oldstyle" 600 1
echo "[$(date +%H:%M:%S)] queue6 complete"
