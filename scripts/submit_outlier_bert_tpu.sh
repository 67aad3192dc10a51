#!/bin/bash
# BERT-base softmax1 MLM pretraining — reference hyperparameters
# (OutEffHop_script/submit_outlier_bert.sh:35-62: 200k steps, bs 256,
# lr 1e-4, warmup 10k, wd 0.01, clip 1.0, seq 128, ckpt every 5000).
# Run standalone on one host, or through launch_pod.sh (MULTIHOST=1).
set -euo pipefail

MULTIHOST_FLAG=${MULTIHOST:+--multihost}
SOFTMAX=${SOFTMAX:-softmax1}   # vanilla | softmax1 | clipped(...) presets

python -m outeffhop_tpu.drivers.run_mlm \
  --dataset_setup "${DATASET_SETUP:-bookcorpus_and_wiki}" \
  --tokenizer_name bert-base-uncased \
  --data_cache_dir "${DATA_CACHE_DIR:-.hf_data}" \
  --max_seq_len 128 \
  --mlm_probability 0.15 \
  --learning_rate 0.0001 \
  --max_train_steps 200000 \
  --num_warmup_steps 10000 \
  --per_device_train_batch_size 256 \
  --per_device_eval_batch_size 256 \
  --gradient_accumulation_steps 1 \
  --max_grad_norm 1.0 \
  --weight_decay 0.01 \
  --checkpointing_steps 5000 \
  --tb_hist_log_interval 100000 \
  --attn_softmax "$SOFTMAX" \
  --dtype bfloat16 \
  --use_flash \
  --seed 1000 \
  --with_tracking --report_to jsonl,tensorboard \
  --run_name "${RUN_NAME:-bert_${SOFTMAX}_200k}" \
  --output_dir "${OUTPUT_DIR:-output/bert_${SOFTMAX}}" \
  $MULTIHOST_FLAG "$@"
