#!/bin/bash
# Full-size hardware validation of the remaining posterior-regression
# modes: estimate0 (synth-only, lsps_trainer.py:228-231), estimate1
# (real-only, :232-235) and estimate4 (semi-supervised, :236-259 with
# the labeled-b term).  estimate3/5 already have full-size chains
# (docs/BENCHMARKS.md); these three only ever ran in unit tests and the
# multichip dryrun.  Starts each mode from the SAME healthy pretrain
# basin (the seed-23455 native A/B arm snapshots) so the eval numbers
# are comparable across modes.
# Usage: bash scripts/estmodes_validate.sh [iters]
set -ex
cd "$(dirname "$0")/.."
IT=${1:-3000}
SRC=outputs/synth_full
OUT=outputs/estmodes
mkdir -p "$OUT" logs/estmodes
cp "$SRC"/pre_gen_00020000.npz "$SRC"/pre_dis_00020000.npz \
   "$SRC"/pre_map_00020000.npz "$OUT"/
# modes 3/4 load the pose VAE keyed 2+frac; modes 0/1 (and 5) key it by
# frac alone (cli/depth_train.py:117, reference depth_train.py:118-124)
cp "$SRC"/pre_vae_2.90_00020000.npz "$OUT"/
cp "$SRC"/pre_vae_2.90_00020000.npz "$OUT"/pre_vae_0.90_00020000.npz
export LSPS_NATIVE=1
unset LSPS_AUGMENT

for MODE in estimate0 estimate1 estimate4; do
  # each mode must resume the SHARED pretrain dis snapshot, not the
  # previous mode's pre_est_dis_* (get_model_list substring-matches
  # 'dis' and sorts lexicographically, so pre_est_* would shadow pre_*)
  rm -f "$OUT"/pre_est_*
  python -m lsps_tpu.cli.depth_train --config exps/synth_full.yaml \
    --snapshot-prefix "$OUT/pre" \
    --mode "$MODE" --frac 0.9 --max-iterations "$IT" --batch-size 32 \
    --bf16 --log ./logs/estmodes > "logs/estmodes/$MODE.log" 2>&1 \
    || exit 1
done
echo DONE
