#!/bin/bash
# FP + INT8 W8A8 PTQ validation — reference commands
# (OutEffHop_script/submit_outlier_valid_bert.sh / _opt.sh; README.md:66-160).
# MODEL=bert (default) or MODEL=opt.
set -euo pipefail

MODEL=${MODEL:-bert}
CKPT=${CKPT:-}           # --model_name_or_path of a converted checkpoint dir
CKPT_FLAG=${CKPT:+--model_name_or_path $CKPT}

if [ "$MODEL" = "bert" ]; then
  # README.md:88-103: W8A8, est 16 batches, sym weights / asym running acts
  python -m outeffhop_tpu.drivers.validate_mlm \
    --attn_softmax "${SOFTMAX:-softmax1}" \
    --quantize --est_num_batches 16 \
    --ranges_weights current_minmax --qmethod symmetric_uniform \
    --ranges_acts running_minmax --qmethod_acts asymmetric_uniform \
    --execute_int8 \
    --save_quantized_dir "${OUTPUT_DIR:-output/valid_bert}/qckpt" \
    --output_dir "${OUTPUT_DIR:-output/valid_bert}" \
    $CKPT_FLAG "$@"
else
  # README.md:131-160: fp32_head, percentile 99.999, est 4 batches
  python -m outeffhop_tpu.drivers.validate_clm \
    --attn_softmax "${SOFTMAX:-vanilla}" \
    --attn_gate_type "${GATE:-conditional_per_token}" \
    --quantize --quant_setup fp32_head --est_num_batches 4 \
    --ranges_acts running_minmax --qmethod_acts asymmetric_uniform \
    --percentile 99.999 \
    --execute_int8 \
    --save_quantized_dir "${OUTPUT_DIR:-output/valid_opt}/qckpt" \
    --output_dir "${OUTPUT_DIR:-output/valid_opt}" \
    $CKPT_FLAG "$@"
fi
