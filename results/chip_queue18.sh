#!/bin/bash
# Round-5 chip queue #18: blocked flash-decode kernel (probe29), train-step
# breakdown (probe28), leftover probe27 remat cells (B512).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "[$(date +%H:%M:%S)] running probe29 (blocked decode kernel)"
timeout 5400 python results/perf_probe29.py > results/probe29_decode.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] probe29 DONE" || echo "[$(date +%H:%M:%S)] probe29 FAILED"

echo "[$(date +%H:%M:%S)] running probe28 (train breakdown)"
timeout 7200 python results/perf_probe28.py > results/probe28_train_breakdown.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] probe28 DONE" || echo "[$(date +%H:%M:%S)] probe28 FAILED"

echo "[$(date +%H:%M:%S)] running probe27 remat cells (B512)"
for cell in "512 remat" "512 noremat"; do
  timeout 1800 python results/perf_probe27.py $cell >> results/probe27_remat.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe27 $cell DONE" || echo "[$(date +%H:%M:%S)] probe27 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue18 complete"
