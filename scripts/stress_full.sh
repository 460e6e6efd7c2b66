#!/bin/bash
# Full-size (ch=64) GAN stress chain on the synthetic manifold, one v5e
# chip: pose-VAE -> adversarial pretrain -> estimate3 regression.
# Usage: bash scripts/stress_full.sh [pose_iters] [pretrain_iters] [est_iters]
set -x
export LSPS_NATIVE=1   # fused C++ batch augmentation in the loader
cd "$(dirname "$0")/.."
POSE=${1:-20000}   # vae saves at 4*snapshot_save_iterations = 20000
PRE=${2:-30000}
EST=${3:-15000}
LOG=${LOG_DIR:-./logs/stress_full}
mkdir -p "$LOG"

python -m lsps_tpu.cli.pose_train --config exps/synth_full.yaml \
  --frac 0.9 --max-iterations "$POSE" --log "$LOG" \
  > "$LOG/pose.log" 2>&1 || exit 1

python -m lsps_tpu.cli.depth_train --config exps/synth_full.yaml \
  --mode pretrain --max-iterations "$PRE" --batch-size 8 --log "$LOG" \
  > "$LOG/pretrain.log" 2>&1 || exit 2

python -m lsps_tpu.cli.depth_train --config exps/synth_full.yaml \
  --mode estimate3 --frac 0.9 --max-iterations "$EST" --batch-size 8 \
  --log "$LOG" > "$LOG/estimate3.log" 2>&1 || exit 3

echo DONE
