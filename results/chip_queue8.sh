#!/bin/bash
# Round-4 chip queue #3 (consolidated): remaining round-4 measurements with
# timeouts sized for the remote-compile tunnel (each BERT/OPT-scale jitted
# scan program takes ~3-6 min to compile remotely; probe20_bert's 4 programs
# blew the old 1500 s budget twice).
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

# fused clipped-softmax1 epilogue e2e (BERT bidirectional T512, above gate)
run_task probe20_bert_noflash "PYTHONUNBUFFERED=1 python results/perf_probe20.py bert noflash" 2700
run_task probe20_bert_flash "PYTHONUNBUFFERED=1 python results/perf_probe20.py bert flash" 2700
# packed Pallas backward e2e (ViT train, non-causal above gate)
run_task probe21_train_vit "PYTHONUNBUFFERED=1 python results/perf_probe21.py vit" 2700
# fused decode kernel matrix — the int8-KV adjudication
run_task probe22_decode "PYTHONUNBUFFERED=1 python results/perf_probe22.py" 2700
# in-model Mosaic crash bisect (one process per variant; SIGABRT = trigger)
run_task probe23_standalone "PYTHONUNBUFFERED=1 python results/perf_probe23.py standalone" 1200 1
run_task probe23_scan "PYTHONUNBUFFERED=1 python results/perf_probe23.py scan" 1200 1
run_task probe23_dense "PYTHONUNBUFFERED=1 python results/perf_probe23.py dense" 1200 1
run_task probe23_layer "PYTHONUNBUFFERED=1 python results/perf_probe23.py layer" 1200 1
run_task probe23_model2 "PYTHONUNBUFFERED=1 python results/perf_probe23.py model2" 1200 1
# train steps (OPT causal rows now XLA-dispatch parity → executable-cache hits)
run_task probe21_train_opt "PYTHONUNBUFFERED=1 python results/perf_probe21.py opt" 2700
run_task probe21_train_bert "PYTHONUNBUFFERED=1 python results/perf_probe21.py bert" 2700
# headline bench
run_task bench_r4 "python bench.py" 1800
# gated-OPT e2e rerun (flash row must be parity-by-dispatch, no crash)
run_task probe14_opt_r4b "PYTHONUNBUFFERED=1 python results/perf_probe14.py opt" 2700
run_task probe20_opt_r4 "PYTHONUNBUFFERED=1 python results/perf_probe20.py opt" 2700
# EXPECTED SIGABRT: round-3 root-cause confirmation, last
run_task probe19_oldstyle "PYTHONUNBUFFERED=1 python results/perf_probe19.py oldstyle" 900 1
echo "[$(date +%H:%M:%S)] queue8 complete"
