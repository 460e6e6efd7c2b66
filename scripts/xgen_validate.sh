#!/bin/bash
# Full-size hardware validation of the SharedResXGen generator variant
# (lsps_nets.py:277-387): a pretrain long enough to read GAN health +
# step time at the production shapes.  SharedResXGen only ever ran in
# unit tests and the model-zoo construction tests before this.
# (pretrain does not consume the pose VAE — the frac-keyed load is a
# no-op outside estimate modes, same as the reference flow.)
# Usage: bash scripts/xgen_validate.sh [iters]
set -ex
cd "$(dirname "$0")/.."
IT=${1:-3000}
OUT=outputs/synth_xgen
mkdir -p "$OUT" logs/xgen
export LSPS_NATIVE=1
unset LSPS_AUGMENT
python -m lsps_tpu.cli.depth_train --config exps/synth_xgen.yaml \
  --mode pretrain --seed 23455 --max-iterations "$IT" --batch-size 32 \
  --bf16 --log ./logs/xgen > logs/xgen/pretrain.log 2>&1 || exit 1
echo DONE
