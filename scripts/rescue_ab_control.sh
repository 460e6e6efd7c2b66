#!/bin/bash
# Control arm for the collapse rescue A/B (round 5): seed 777 on
# exps/ab_native_var.yaml with NO intervention (advisory-only guard),
# under the SAME round-5 numerics as scripts/rescue_ab.sh.  Needed
# because the round-5 zeroed_subtrees fix (torch's None-grad Adam
# semantics: with train_map off the map net gets no decay/moments)
# changed this config's trajectories relative to the round-4
# guard_rescue chain — the round-4 16.79 mm reseed-salvage number is
# not comparable under current numerics.  Results:
# docs/BENCHMARKS.md ("collapse rescue A/B").
# Usage: bash scripts/rescue_ab_control.sh [pre_iters] [est_iters]
set -ex
cd "$(dirname "$0")/.."
PRE=${1:-20000}
EST=${2:-5000}
SEED=777
POSE_VAE=outputs/synth_full/pre_vae_2.90_00020000.npz
CFG=exps/ab_native_var.yaml
LOG=./logs/rescue_ab_control
OUT=outputs/ab_native_var

mkdir -p "$LOG"
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
  --seed "$SEED" --max-iterations "$PRE" --batch-size 32 --bf16 \
  --log "$LOG" > "$LOG/pretrain.log" 2>&1 || exit 1
grep -i "collapse" "$LOG/pretrain.log" || true  # advisory expected

python -m lsps_tpu.cli.depth_train --config "$CFG" --mode estimate3 \
  --seed "$SEED" --frac 0.9 --max-iterations "$EST" --batch-size 32 \
  --bf16 --log "$LOG" > "$LOG/estimate3.log" 2>&1 || exit 2
grep "Mean err" "$LOG/estimate3.log" | tail -3
echo DONE
