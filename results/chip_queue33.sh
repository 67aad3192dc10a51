#!/bin/bash
# Driver-round-5 chip queue #33: adjudicate the bench guard-line 0.9313 —
# re-run the round-4 probe20 harness (bert flash + noflash) on round-5 code.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while ! grep -q "queue32 complete" results/chip_queue32.log 2>/dev/null; do
  sleep 30
done

echo "[$(date +%H:%M:%S)] probe20 rerun (round-5 code)"
timeout 2700 python results/perf_probe20.py bert both >> results/probe20_rerun_r5.log 2>&1 \
  && echo "[$(date +%H:%M:%S)] probe20 rerun DONE" || echo "[$(date +%H:%M:%S)] probe20 rerun FAILED"
echo "[$(date +%H:%M:%S)] queue33 complete"
