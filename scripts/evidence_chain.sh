#!/bin/bash
# Compressed full-pipeline evidence chain (pose-VAE 20k -> adversarial
# pretrain -> estimate4) with committed log snapshots.
#
# Why this exists: the accuracy-record chains (scripts/est4_record.sh,
# scripts/icvl_record.sh, docs/BENCHMARKS.md) leave their evidence in
# ./logs/**, which is outside git and lost on environment resets.  This
# script re-runs the same recipe at a schedule sized for <~45 min on
# one v5e chip and then snapshots the metric-bearing log tails into
# docs/evidence/ (scripts/snapshot_evidence.py) so the claims stay
# checkable from the repository alone.  The absolute mm number at this
# compressed schedule is expected to be WORSE than the 6.67 mm record
# (shorter pretrain basin); what it evidences is the full
# pose->pretrain->estimate handoff, GAN health, and eval protocol
# (reference chain: src/pose_train.py + src/depth_train.py modes
# pretrain/estimate4).
#
# Usage: bash scripts/evidence_chain.sh [pose_iters] [pre_iters] [est_iters]
set -ex
cd "$(dirname "$0")/.."
POSE=${1:-20000}   # vae saves at 4*snapshot_save_iterations = 20000
PRE=${2:-10000}
EST=${3:-5000}
LOG=${LOG_DIR:-./logs/evidence_chain}
OUT=outputs/synth_full   # snapshot_prefix in exps/synth_full.yaml
mkdir -p "$LOG"
export LSPS_NATIVE=1   # the record-chain augment backend
unset LSPS_AUGMENT

python -m lsps_tpu.cli.pose_train --config exps/synth_full.yaml \
  --frac 0.9 --max-iterations "$POSE" --log "$LOG" \
  > "$LOG/pose.log" 2>&1 || exit 1

python -m lsps_tpu.cli.depth_train --config exps/synth_full.yaml \
  --mode pretrain --max-iterations "$PRE" --batch-size 32 --bf16 \
  --log "$LOG" > "$LOG/pretrain.log" 2>&1 || exit 2

rm -f "$OUT"/pre_est_*
python -m lsps_tpu.cli.depth_train --config exps/synth_full.yaml \
  --mode estimate4 --frac 0.9 --max-iterations "$EST" --batch-size 32 \
  --bf16 --log "$LOG" > "$LOG/estimate4.log" 2>&1 || exit 3

python scripts/snapshot_evidence.py "$LOG"
echo DONE
