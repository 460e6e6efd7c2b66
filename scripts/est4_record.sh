#!/bin/bash
# Accuracy-record chain for estimate4 (semi-supervised with the
# labeled-b term, lsps_trainer.py:236-259): the estmodes validation
# (docs/BENCHMARKS.md) reached 8.24 mm in only 3k iterations — already
# past the 8.61 mm round-2 estimate3 record — so run it longer from the
# same healthy pretrain basin (seed-23455 native A/B arm, 20k) and let
# the per-eval best tracking find the pre-overfit optimum.
# Usage: bash scripts/est4_record.sh [iters]
#   OUT=outputs/est4_record30k LOGD=logs/est4_record30k \
#     bash scripts/est4_record.sh 30000   # fresh dir = fresh est run
#     (reusing an OUT dir resumes its pre_est_* snapshots instead);
#     30k reaches the first two LR-halving milestones (est mode steps
#     the dis scheduler every 100 iters -> boundaries at 20k/30k).
set -ex
cd "$(dirname "$0")/.."
IT=${1:-10000}
PRE=${PRE:-20000}
SRC=outputs/synth_full
OUT=${OUT:-outputs/est4_record}
LOGD=${LOGD:-logs/est4_record}
mkdir -p "$OUT" "$LOGD"
export LSPS_NATIVE=1
unset LSPS_AUGMENT

# The 20k-basin snapshots are large and live outside git; regenerate
# them when absent (resuming any earlier pre_* snapshot in SRC — the
# committed evidence chain leaves the seed-23455 10k ones there, and
# resume == straight-through is pinned by the LR-boundary-resume test).
# The pose VAE comes from a separate pose_train stage (fraction-keyed
# 2+frac naming; saves at 4*snapshot_save_iterations = 20000) — the
# pretrain stage never writes it, so regenerate it too when absent.
if [ ! -f "$SRC"/pre_vae_2.90_00020000.npz ]; then
  python -m lsps_tpu.cli.pose_train --config exps/synth_full.yaml \
    --frac 0.9 --max-iterations 20000 --log "$LOGD" \
    > "$LOGD/pose.log" 2>&1 || exit 3
fi
if [ ! -f "$SRC"/pre_gen_$(printf %08d "$PRE").npz ]; then
  rm -f "$SRC"/pre_est_*   # est snapshots would shadow get_model_list
  RESUME=0
  ls "$SRC"/pre_gen_*.npz >/dev/null 2>&1 && RESUME=1
  python -m lsps_tpu.cli.depth_train --config exps/synth_full.yaml \
    --mode pretrain --resume "$RESUME" --max-iterations "$PRE" \
    --batch-size 32 --bf16 --log "$LOGD" \
    > "$LOGD/pretrain.log" 2>&1 || exit 2
fi

PTAG=$(printf %08d "$PRE")
cp "$SRC"/pre_gen_"$PTAG".npz "$SRC"/pre_dis_"$PTAG".npz \
   "$SRC"/pre_map_"$PTAG".npz "$OUT"/
# estimate4 loads the pose VAE keyed 2+frac (cli/depth_train.py:117)
cp "$SRC"/pre_vae_2.90_00020000.npz "$OUT"/

python -m lsps_tpu.cli.depth_train --config exps/synth_full.yaml \
  --snapshot-prefix "$OUT/pre" \
  --mode estimate4 --frac 0.9 --max-iterations "$IT" --batch-size 32 \
  --bf16 --log "$LOGD" \
  > "$LOGD/estimate4.log" 2>&1 || exit 1

# commit-ready evidence: metric-bearing log tails into docs/evidence/
python scripts/snapshot_evidence.py "$LOGD" || true
echo DONE
