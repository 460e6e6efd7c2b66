#!/bin/bash
# Serving A/B on the real TPU: crop-warp lowering (gather vs einsum)
# across the batch sweep, with chained device-only timing, then the
# driver bench (raw-path + b64 throughput rows).  ONE job at a time on
# this host; run only when the TPU is otherwise idle.
# Usage: bash scripts/serve_ab.sh [batches]
set -ex
cd "$(dirname "$0")/.."
B=${1:-1,32,64,128,256}
LOG=logs/serve_ab
mkdir -p "$LOG"

env -u JAX_PLATFORMS python scripts/bench_serve_scale.py \
  --batches "$B" --warp gather > "$LOG/gather.jsonl" 2> "$LOG/gather.err"
env -u JAX_PLATFORMS python scripts/bench_serve_scale.py \
  --batches "$B" --warp einsum > "$LOG/einsum.jsonl" 2> "$LOG/einsum.err"
env -u JAX_PLATFORMS python bench.py > "$LOG/bench.json" 2> "$LOG/bench.err"
echo DONE
