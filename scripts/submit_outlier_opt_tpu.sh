#!/bin/bash
# OPT-125m (12L12H) gated-attention CLM pretraining — reference
# hyperparameters (OutEffHop_script/submit_outlier_opt.sh:33-63: 125k steps,
# bs 48 x 4 accum, lr 4e-4, betas (0.9, 0.95), warmup 2000, wd 0.1, block 512).
set -euo pipefail

MULTIHOST_FLAG=${MULTIHOST:+--multihost}
SOFTMAX=${SOFTMAX:-vanilla}

python -m outeffhop_tpu.drivers.run_clm \
  --dataset_setup "${DATASET_SETUP:-bookcorpus_and_wiki}" \
  --tokenizer_name facebook/opt-350m \
  --data_cache_dir "${DATA_CACHE_DIR:-.hf_data}" \
  --config_yaml model_configs/opt-12L12H.yaml \
  --block_size 512 \
  --learning_rate 0.0004 \
  --max_train_steps 125000 \
  --num_warmup_steps 2000 \
  --per_device_train_batch_size 48 \
  --per_device_eval_batch_size 48 \
  --gradient_accumulation_steps 4 \
  --max_grad_norm 1.0 \
  --weight_decay 0.1 \
  --checkpointing_steps 5000 \
  --tb_hist_log_interval 10000 \
  --attn_softmax "$SOFTMAX" \
  --attn_gate_type "${GATE:-none}" \
  --dtype bfloat16 \
  --use_flash \
  --seed 1000 \
  --with_tracking --report_to jsonl,tensorboard \
  --run_name "${RUN_NAME:-opt125m_${SOFTMAX}}" \
  --output_dir "${OUTPUT_DIR:-output/opt_${SOFTMAX}}" \
  $MULTIHOST_FLAG "$@"
