#!/bin/bash
# Collapse-guard hardware validation (round 4): rescue the seed-777
# basin.  The round-3 2x2 study (docs/BENCHMARKS.md "fused-step
# accuracy A/B") showed BOTH augment backends land discriminator-
# dominant at seed 777 (tail fake acc 0.95/0.99, estimate3 stuck at
# ~19-20 mm).  This chain re-runs the native arm at seed 777 with the
# round-4 online guard armed: pretrain must detect the dominant basin
# (windowed fake acc >= 0.92 from iteration 3000), abort, restart with
# a fresh seed fold, finish healthy, and estimate3 from the rescued
# basin must open well under the ~19-20 mm dominant-basin signature.
# Usage: bash scripts/guard_rescue.sh [pre_iters] [est_iters] [budget]
set -ex
cd "$(dirname "$0")/.."
PRE=${1:-20000}
EST=${2:-5000}
BUDGET=${3:-2}
SEED=777
POSE_VAE=outputs/synth_full/pre_vae_2.90_00020000.npz
CFG=exps/ab_native_var.yaml
LOG=./logs/guard_rescue
OUT=outputs/ab_native_var

rm -rf "$OUT"
mkdir -p "$LOG" "$OUT"
cp "$POSE_VAE" "$OUT/"
export LSPS_NATIVE=1
unset LSPS_AUGMENT

python -m lsps_tpu.cli.depth_train --config "$CFG" --mode pretrain \
  --seed "$SEED" --reseed-on-collapse "$BUDGET" \
  --max-iterations "$PRE" --batch-size 32 --bf16 \
  --log "$LOG" > "$LOG/pretrain.log" 2>&1 || exit 1
grep "collapse guard" "$LOG/pretrain.log"   # must show detect+restart

python -m lsps_tpu.cli.depth_train --config "$CFG" --mode estimate3 \
  --seed "$SEED" --frac 0.9 --max-iterations "$EST" --batch-size 32 \
  --bf16 --log "$LOG" > "$LOG/estimate3.log" 2>&1 || exit 2
grep "Mean err" "$LOG/estimate3.log" | tail -3
echo DONE
