#!/bin/bash
# Collapse rescue A/B (round 5): detect-and-RESCUE vs detect-and-reseed
# on the same persistently collapse-prone draw.
#
# Round 4 (scripts/guard_rescue.sh, docs/evidence/guard_rescue/) showed
# seed 777 on exps/ab_native_var.yaml collapses discriminator-dominant
# on BOTH augment backends, the guard detects it at ~4.4-7.6k of 20k,
# and after a --reseed-on-collapse budget of 2 the best salvage was
# 16.79 mm — far off the 7-8 mm healthy-basin records.  This chain runs
# the SAME seed with the round-5 rescue action instead: on detection the
# discriminator is frozen for --rescue-iters generator-only updates
# (dis LR -> 0, the limiting form of the reduce-dis-LR intervention),
# then normal alternation resumes with a re-armed guard.  estimate3 from
# the resulting basin answers whether the seed CONVERTED to a healthy
# basin (vs burning a reseed).  Results: docs/BENCHMARKS.md
# ("collapse rescue A/B").
# Usage: bash scripts/rescue_ab.sh [pre_iters] [est_iters] [budget] [phase_iters]
set -ex
cd "$(dirname "$0")/.."
PRE=${1:-20000}
EST=${2:-5000}
BUDGET=${3:-2}
PHASE=${4:-500}
SEED=777
POSE_VAE=outputs/synth_full/pre_vae_2.90_00020000.npz
CFG=exps/ab_native_var.yaml
LOG=./logs/rescue_ab
OUT=outputs/ab_native_var

mkdir -p "$LOG"
# the pose VAE lives outside git; regenerate when absent (fraction-keyed
# 2+frac naming, saved at 4*snapshot_save_iterations = 20000)
if [ ! -f "$POSE_VAE" ]; then
  python -m lsps_tpu.cli.pose_train --config exps/synth_full.yaml \
    --frac 0.9 --max-iterations 20000 --log "$LOG" \
    > "$LOG/pose.log" 2>&1 || exit 3
fi

rm -rf "$OUT"
mkdir -p "$OUT"
cp "$POSE_VAE" "$OUT/"
export LSPS_NATIVE=1
unset LSPS_AUGMENT

python -m lsps_tpu.cli.depth_train --config "$CFG" --mode pretrain \
  --seed "$SEED" --rescue-on-collapse "$BUDGET" --rescue-iters "$PHASE" \
  --max-iterations "$PRE" --batch-size 32 --bf16 \
  --log "$LOG" > "$LOG/pretrain.log" 2>&1 || exit 1
grep "rescue phase" "$LOG/pretrain.log"   # must show the intervention

python -m lsps_tpu.cli.depth_train --config "$CFG" --mode estimate3 \
  --seed "$SEED" --frac 0.9 --max-iterations "$EST" --batch-size 32 \
  --bf16 --log "$LOG" > "$LOG/estimate3.log" 2>&1 || exit 2
grep "Mean err" "$LOG/estimate3.log" | tail -3
echo DONE
