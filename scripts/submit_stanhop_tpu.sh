#!/bin/bash
# STanHop ETTh1 train/test — reference command (README.md:162-208,
# OutEffHop_script/submit_STHM.sh): in 168, out 24/48, seg 6, e_layers 11.
# QUANTIZE=1 adds the quantized-STanHop pass (advertised upstream but absent
# from the reference snapshot — STanHop_outlier/ is empty).
set -euo pipefail

QUANT_FLAG=${QUANTIZE:+--quantize}

python -m outeffhop_tpu.drivers.main_stanhop \
  --data "${DATA:-ETTh1}" \
  --in_len 168 --out_len "${OUT_LEN:-24}" --seg_len 6 \
  --e_layers 11 --batch_size 128 \
  --mode "${MODE:-entmax}" \
  --itr "${ITR:-1}" \
  $QUANT_FLAG "$@"
