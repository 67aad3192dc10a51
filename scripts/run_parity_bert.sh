#!/usr/bin/env bash
# Real-weight BERT parity run (see scripts/parity_runbook.md).
# Requires network access + a checkout of the reference at $REFERENCE.
set -euo pipefail

REFERENCE=${REFERENCE:-/root/reference/OutEffHop}
CKPT=${CKPT:-ckpt}
SOFTMAX=${SOFTMAX:-vanilla}   # or softmax1 / "clippedsoftmax1(-.025:1)" for a
                              # reference-pretrained checkpoint

if [ ! -f "$CKPT/pytorch_model.bin" ]; then
  python - <<EOF
from transformers import BertForMaskedLM
m = BertForMaskedLM.from_pretrained("bert-base-uncased")
m.save_pretrained("$CKPT", safe_serialization=False)
EOF
fi

# --- reference side (torch; skip with SKIP_REF=1 if no torch env) ---
if [ "${SKIP_REF:-0}" != "1" ]; then
  (cd "$REFERENCE" && accelerate launch --config_file accelerate_configs/1gpu_no_mp.yaml \
    validate_mlm_config.py --seed 3000 --dataset_setup bookcorpus_and_wiki \
    --preprocessing_num_workers 8 --model_type bert --max_seq_length 128 \
    --mlm_probability 0.15 --per_device_eval_batch_size 32 \
    --attn_softmax "$SOFTMAX" --data_cache_dir .hf_data --model_cache_dir .hf_cache \
    --model_name_or_path "$OLDPWD/$CKPT" --output_dir "$OLDPWD/out_ref_fp")
  (cd "$REFERENCE" && accelerate launch --config_file accelerate_configs/1gpu_no_mp.yaml \
    validate_mlm_config.py --quantize --est_num_batches 16 --seed 4000 \
    --dataset_setup bookcorpus_and_wiki --preprocessing_num_workers 8 \
    --model_type bert --max_seq_length 128 --mlm_probability 0.15 \
    --per_device_eval_batch_size 32 --attn_softmax "$SOFTMAX" \
    --data_cache_dir .hf_data --model_cache_dir .hf_cache \
    --model_name_or_path "$OLDPWD/$CKPT" --output_dir "$OLDPWD/out_ref_int8")
fi

# --- this repo's side (jax) ---
python -m outeffhop_tpu.drivers.validate_mlm \
  --seed 3000 --dataset_setup bookcorpus_and_wiki --block_size_mlm 128 \
  --mlm_probability 0.15 --per_device_eval_batch_size 32 \
  --attn_softmax "$SOFTMAX" --data_cache_dir .hf_data \
  --model_name_or_path "$CKPT" --tokenizer_name bert-base-uncased \
  --dtype float32 --quantize --est_num_batches 16 --output_dir out_tpu

echo "reference FP:   $(cat out_ref_fp/all_results.json 2>/dev/null || echo 'skipped')"
echo "reference INT8: $(cat out_ref_int8/all_results.json 2>/dev/null || echo 'skipped')"
echo "this repo:      $(cat out_tpu/all_results.json)"
echo "Fill the table in scripts/parity_runbook.md §4 with these numbers."
