"""Export a trained experiment as a deployable AOT artifact.

    python -m lsps_tpu.cli.export_model --config exps/nnyu.yaml \
        --est --frac 0.9 --out pose.lsps [--batch 8 | --symbolic] \
        [--platforms tpu,cpu] [--bf16]

Builds the estimator from the experiment's snapshots (same loading path
as the serving daemon) and writes a self-contained StableHLO program
(weights baked in) that any PJRT runtime executes without Python or
model code (serve/export.py).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export trained LSPS-TPU model to an AOT artifact")
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--frac", type=float, default=0.0)
    p.add_argument("--est", action="store_true")
    p.add_argument("--idx", type=int, default=-1)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--batch", type=int, default=1,
                   help="static batch size of the exported program")
    p.add_argument("--symbolic", action="store_true",
                   help="symbolic batch dimension (one artifact, any "
                        "batch size)")
    p.add_argument("--raw", action="store_true",
                   help="bake the raw-detection program (frames, cubes)"
                        " -> (joints, coms): CoM detection on device, no"
                        " detector needed at the deployment site")
    p.add_argument("--frame-shape", type=str, default="480,640")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated lowering targets, e.g. tpu,cpu")
    opts = p.parse_args(argv)

    from lsps_tpu.serve.export import export_pose_program, save_pose_program
    from lsps_tpu.serve.server import build_estimator

    est = build_estimator(opts.config, frac=opts.frac, est=opts.est,
                          idx=opts.idx, bf16=opts.bf16)
    h, w = (int(x) for x in opts.frame_shape.split(","))
    platforms = (tuple(opts.platforms.split(","))
                 if opts.platforms else None)
    exported = export_pose_program(
        est, batch=None if opts.symbolic else opts.batch,
        frame_shape=(h, w), platforms=platforms, raw=opts.raw)
    save_pose_program(opts.out, exported)
    print(f"wrote {opts.out} ({os.path.getsize(opts.out)} bytes, "
          f"platforms={exported.platforms})")


if __name__ == "__main__":
    main(sys.argv[1:])
