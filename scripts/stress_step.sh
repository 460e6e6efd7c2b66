#!/bin/bash
# Full-size (ch=64) chain exercising the round-3 fast path end-to-end on
# one v5e chip: fused-in-step augmentation (LSPS_AUGMENT=step, the
# gather-free einsum warp) + bf16 compute at batch 32.
# pose-VAE -> adversarial pretrain -> estimate3 regression, all through
# the product CLIs (exps/synth_step.yaml, snapshots under
# outputs/synth_step/).  The pose phase additionally runs
# --steps-per-call 8 to exercise multi-step dispatch at full size
# (measured a latency LOSS on the tunneled single-chip platform — see
# docs/BENCHMARKS.md — but it must train correctly; the depth phases
# run the recommended single-step dispatch).
# Usage: bash scripts/stress_step.sh [pose_iters] [pretrain_iters] [est_iters]
set -x
export LSPS_AUGMENT=step   # warp runs inside the training program
cd "$(dirname "$0")/.."
POSE=${1:-20000}   # vae saves at 4*snapshot_save_iterations = 20000
PRE=${2:-20000}
EST=${3:-10000}
LOG=${LOG_DIR:-./logs/stress_step}
mkdir -p "$LOG"

python -m lsps_tpu.cli.pose_train --config exps/synth_step.yaml \
  --frac 0.9 --max-iterations "$POSE" --steps-per-call 8 \
  --log "$LOG" > "$LOG/pose.log" 2>&1 || exit 1

python -m lsps_tpu.cli.depth_train --config exps/synth_step.yaml \
  --mode pretrain --max-iterations "$PRE" --batch-size 32 --bf16 \
  --log "$LOG" > "$LOG/pretrain.log" 2>&1 || exit 2

python -m lsps_tpu.cli.depth_train --config exps/synth_step.yaml \
  --mode estimate3 --frac 0.9 --max-iterations "$EST" --batch-size 32 \
  --bf16 --log "$LOG" > "$LOG/estimate3.log" 2>&1 || exit 3

echo DONE
