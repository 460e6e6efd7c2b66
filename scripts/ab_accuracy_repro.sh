#!/bin/bash
# A/B arm reproducing the round-2 "bf16 production-mode soak" recipe
# exactly (docs/BENCHMARKS.md: pretrain 20k + estimate3 20k, batch 32,
# --bf16, 384-frame synthetic set, native batch augmentation in the
# loader) on exps/synth_full.yaml — versus the round-3 fast-path chain
# (exps/synth_step.yaml, LSPS_AUGMENT=step) which measured ~20 mm.
# Discriminates "fast path changed accuracy" from "adversarial-run
# variance": the trainer-level equivalence tests pin the step math to
# 1e-6 across backends, so a reproduced ~8.6 mm here would point at
# the run basin (pretrain latent quality), not the code path.
# Usage: bash scripts/ab_accuracy_repro.sh [pose_iters] [pre_iters] [est_iters]
set -x
export LSPS_NATIVE=1
unset LSPS_AUGMENT
cd "$(dirname "$0")/.."
POSE=${1:-20000}
PRE=${2:-20000}
EST=${3:-20000}
LOG=${LOG_DIR:-./logs/ab_native}
mkdir -p "$LOG"

# round-2 pose VAE was trained single-step f32; pin that explicitly
python -m lsps_tpu.cli.pose_train --config exps/synth_full.yaml \
  --frac 0.9 --max-iterations "$POSE" --steps-per-call 1 \
  --log "$LOG" > "$LOG/pose.log" 2>&1 || exit 1

python -m lsps_tpu.cli.depth_train --config exps/synth_full.yaml \
  --mode pretrain --max-iterations "$PRE" --batch-size 32 --bf16 \
  --log "$LOG" > "$LOG/pretrain.log" 2>&1 || exit 2

python -m lsps_tpu.cli.depth_train --config exps/synth_full.yaml \
  --mode estimate3 --frac 0.9 --max-iterations "$EST" --batch-size 32 \
  --bf16 --log "$LOG" > "$LOG/estimate3.log" 2>&1 || exit 3

echo DONE
