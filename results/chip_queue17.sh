#!/bin/bash
# Round-4 chip queue #11: dbias-slab grad lowering validation + remat sweep.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo "[$(date +%H:%M:%S)] running probe26b_grad_fix"
if timeout 1500 python results/perf_probe26b.py new_scale1_grad > results/probe26b_grad_fix.log 2>&1; then
  echo "[$(date +%H:%M:%S)] probe26b_grad_fix DONE"
else
  echo "[$(date +%H:%M:%S)] probe26b_grad_fix FAILED"
fi
echo "[$(date +%H:%M:%S)] running probe21_train_vit_r3 (packed bwd with dbias slab still wins?)"
timeout 2700 python results/perf_probe21.py vit > results/probe21_train_vit_r3.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] probe21_train_vit_r3 DONE" || echo "[$(date +%H:%M:%S)] probe21_train_vit_r3 FAILED"
echo "[$(date +%H:%M:%S)] running probe27 remat cells"
for cell in "256 remat" "512 remat" "512 noremat"; do
  timeout 1800 python results/perf_probe27.py $cell >> results/probe27_remat.log 2>&1 \
    && echo "[$(date +%H:%M:%S)] probe27 $cell DONE" || echo "[$(date +%H:%M:%S)] probe27 $cell FAILED"
done
echo "[$(date +%H:%M:%S)] queue17 complete"
