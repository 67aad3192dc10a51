#!/bin/bash
# Fan a driver command out to every host of a TPU pod slice.
# TPU-native equivalent of the reference's SLURM sbatch headers
# (OutEffHop_script/*.sh): one process per host, env-driven bootstrap.
#
#   TPU_NAME=my-v5e-16 ZONE=us-central1-a bash scripts/launch_pod.sh \
#       scripts/submit_outlier_bert_tpu.sh
#
# Each host runs the script with --multihost, which calls
# jax.distributed.initialize() (outeffhop_tpu/parallel/mesh.py:140-170);
# on TPU VMs coordination auto-detects from the metadata server.
#
# Pipeline parallelism on the slice: append
#     --pipeline_stages 4 --pipeline_microbatches 8
# to the driver args — run_mlm/run_clm then train on the ('pipe','data')
# GPipe mesh (parallel/pipeline.py) instead of the dp x tp mesh.
set -euo pipefail

TPU_NAME=${TPU_NAME:?set TPU_NAME to the tpu-vm name}
ZONE=${ZONE:?set ZONE}
PROJECT_ARG=${PROJECT:+--project=$PROJECT}
CMD_SCRIPT=${1:?usage: launch_pod.sh <script> [args...]}
shift || true

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone="$ZONE" $PROJECT_ARG \
  --worker=all \
  --command="cd $(basename "$PWD") && MULTIHOST=1 bash $CMD_SCRIPT $*"
