#!/usr/bin/env bash
# Train nano-GenCast on one TPU VM (the TPU equivalent of the reference's
# scripts/train.sh SLURM job).
set -euo pipefail

DATA_DIR=${DATA_DIR:-/data/era5}
CKPT_DIR=${CKPT_DIR:-/ckpt/gencast_nano}
STEPS=${STEPS:-30000}

python -m gencast_tpu.training.train \
  --preset nano \
  --data "$DATA_DIR" \
  --steps "$STEPS" \
  --batch_size 1 \
  --learning_rate 3e-4 \
  --warmup_steps 1000 \
  --clean_sst_nans \
  --ckpt_dir "$CKPT_DIR" \
  --stats_path "$CKPT_DIR/stats.npz" \
  --save_every 500 --eval_every 500 --do_sampling_eval \
  "$@"
