#!/usr/bin/env python
"""A/B: C_in=1 stem convs as-is vs im2col (patches -> K=49 GEMM).

The MFU roofline argument (docs/BENCHMARKS.md) claims the 7x7 C_in=1
entry convs cap MXU utilization regardless of schedule.  This measures
the one exact reformulation available: extract the 49 taps into the
feature dimension (lax.conv_general_dilated_patches) and contract them
as a GEMM (ops/layers.py set_im2col_stem) — identical math, different
lowering.  Full-size fused pretrain step, both arms, same inputs.

Usage (TPU): env -u JAX_PLATFORMS python scripts/bench_im2col.py \
    [--batch-sizes 32] [--compute-dtype bfloat16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from lsps_tpu.utils.benchutil import V5E_PEAK_FLOPS, flops_of  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-sizes", type=str, default="32")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--ch", type=int, default=64)
    p.add_argument("--compute-dtype", type=str, default="bfloat16")
    opts = p.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.ops import layers
    from lsps_tpu.train import LSPSTrainer

    hyp = default_hyperparameters(reg_dim=108, ch=opts.ch)
    hyp["compute_dtype"] = opts.compute_dtype
    rng = jax.random.PRNGKey(1)

    for bs in [int(b) for b in opts.batch_sizes.split(",")]:
        img = jnp.asarray(
            np.random.RandomState(0).randn(bs, 128, 128, 1), jnp.float32)
        lbl = jnp.zeros((bs, 108), jnp.float32)
        out = {}
        for arm, flag in (("conv", False), ("im2col", True)):
            layers.set_im2col_stem(flag)
            # fresh trainer per arm: the flag is read at trace time
            trainer = LSPSTrainer(hyp, donate=True)
            state = trainer.init_state(jax.random.PRNGKey(0))
            compiled = trainer.pretrain_update.lower(
                state, img, lbl, img, lbl, rng).compile()
            try:
                flops = flops_of(compiled)
            except Exception:
                flops = 0.0
            s = state
            for _ in range(5):
                s, m, _ = compiled(s, img, lbl, img, lbl, rng)
            jax.block_until_ready(m["gen_total_loss"])
            t0 = time.perf_counter()
            for _ in range(opts.iters):
                s, m, _ = compiled(s, img, lbl, img, lbl, rng)
            jax.block_until_ready(m["gen_total_loss"])
            dt = (time.perf_counter() - t0) / opts.iters
            out[arm] = dt
            print(json.dumps({
                "metric": f"pretrain_step_{arm}", "batch": bs,
                "compute_dtype": opts.compute_dtype,
                "value": round(dt * 1e3, 3), "unit": "ms/step",
                "images_per_sec": round(2 * bs / dt, 1),
                "mfu_pct": round(100.0 * flops / dt / V5E_PEAK_FLOPS, 2)
                if flops else None,
                "loss_tail": round(float(np.asarray(m["gen_total_loss"])),
                                   4),
            }), flush=True)
        layers.set_im2col_stem(None)
        print(json.dumps({
            "metric": "im2col_speedup", "batch": bs,
            "value": round(out["conv"] / out["im2col"], 4),
            "unit": "x (conv_ms / im2col_ms; >1 means im2col wins)",
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
