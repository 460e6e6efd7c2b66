#!/bin/bash
# ICVL-family accuracy-record chain.  The round-2 ICVL chain (batch 8,
# estimate3) recorded 15.03 mm; the NYU-family estimate4 record chain
# showed the semi-supervised labeled-b term (lsps_trainer.py:236-259)
# beats estimate3 decisively on small synthetic sets (6.67 vs 8.61 mm).
# Run the same bf16 batch-32 recipe on the second shipped config family
# (48-d pose, 16 joints, exps/nicvl.yaml net shapes): pose-VAE 20k ->
# adversarial pretrain 20k -> estimate3 AND estimate4 10k each from the
# same basin, so the mode comparison is apples-to-apples on ICVL too.
# Usage: bash scripts/icvl_record.sh [pose_iters] [pre_iters] [est_iters]
set -ex
cd "$(dirname "$0")/.."
POSE=${1:-20000}   # vae saves at 4*snapshot_save_iterations = 20000
PRE=${2:-20000}
EST=${3:-10000}
OUT=outputs/synth_icvl   # snapshot_prefix in exps/synth_icvl.yaml
LOG=./logs/icvl_record
mkdir -p "$LOG"
export LSPS_NATIVE=1   # bit-reproduce the record-chain backend
unset LSPS_AUGMENT

python -m lsps_tpu.cli.pose_train --config exps/synth_icvl.yaml \
  --frac 0.9 --max-iterations "$POSE" --log "$LOG" \
  > "$LOG/pose.log" 2>&1 || exit 1

python -m lsps_tpu.cli.depth_train --config exps/synth_icvl.yaml \
  --mode pretrain --max-iterations "$PRE" --batch-size 32 --bf16 \
  --log "$LOG" > "$LOG/pretrain.log" 2>&1 || exit 2

for MODE in estimate3 estimate4; do
  # both modes must resume the SHARED pretrain snapshots; clear the
  # previous mode's pre_est_* so get_model_list doesn't shadow pre_*
  rm -f "$OUT"/pre_est_*
  python -m lsps_tpu.cli.depth_train --config exps/synth_icvl.yaml \
    --mode "$MODE" --frac 0.9 --max-iterations "$EST" --batch-size 32 \
    --bf16 --log "$LOG" > "$LOG/$MODE.log" 2>&1 || exit 3
done

# commit-ready evidence: metric-bearing log tails into docs/evidence/
python scripts/snapshot_evidence.py "$LOG" || true
echo DONE
