#!/usr/bin/env python
"""Training-step benchmark on the current backend.

Measures steady-state wall time of the fused pretrain iteration
(dis_update + gen_update as ONE program, train/trainer.pretrain_update),
optionally the reference-style two-dispatch variant for comparison, and
vae_update — full-size NYU model at the reference batch sizes and
TPU-friendly ones.  Reports MFU from the compiled program's cost
analysis vs the v5e bf16 peak.  Prints one JSON line per config.

Usage: python scripts/bench_train.py [--batch-sizes 1,8,32]
       [--compute-dtype bfloat16] [--split]
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
    p.add_argument("--batch-sizes", type=str, default="1,8,32")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--ch", type=int, default=64)
    p.add_argument("--compute-dtype", type=str, default="float32")
    p.add_argument("--split", action="store_true",
                   help="also time the two-dispatch dis+gen variant")
    p.add_argument("--prng", type=str, default="threefry2x32",
                   help="PRNG impl (threefry2x32 | rbg | unsafe_rbg): the "
                        "GaussianNoise layers draw ~B*32*32*256 normals x5 "
                        "per step; rbg trades bit-stability across "
                        "shardings for hardware RNG speed")
    opts = p.parse_args(argv)

    import numpy as np

    import jax

    if opts.prng != "threefry2x32":
        jax.config.update("jax_default_prng_impl", opts.prng)
    import jax.numpy as jnp

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.train import LSPSTrainer

    hyp = default_hyperparameters(reg_dim=108, ch=opts.ch)
    hyp["compute_dtype"] = opts.compute_dtype
    trainer = LSPSTrainer(hyp, donate=True)
    rng = jax.random.PRNGKey(1)

    for bs in [int(b) for b in opts.batch_sizes.split(",")]:
        state = trainer.init_state(jax.random.PRNGKey(0))
        img = jnp.asarray(
            np.random.RandomState(0).randn(bs, 128, 128, 1), jnp.float32)
        lbl = jnp.zeros((bs, 108), jnp.float32)

        # AOT-compile once and time the compiled executable (the jit
        # wrapper would recompile the same program a second time)
        compiled = trainer.pretrain_update.lower(
            state, img, lbl, img, lbl, rng).compile()
        try:
            flops = flops_of(compiled)
        except Exception:
            flops = 0.0

        # several warmup calls: first executions are inflated by
        # program/arg streaming on this backend
        s = state
        for _ in range(5):
            s, m, _ = compiled(s, img, lbl, img, lbl, rng)
        jax.block_until_ready(m["gen_total_loss"])
        t0 = time.perf_counter()
        for i in range(opts.iters):
            s, m, _ = compiled(s, img, lbl, img, lbl, rng)
        jax.block_until_ready(m["gen_total_loss"])
        dt = (time.perf_counter() - t0) / opts.iters
        print(json.dumps({
            "metric": "pretrain_step_fused", "batch": bs,
            "compute_dtype": opts.compute_dtype,
            "value": round(dt * 1e3, 3), "unit": "ms/step",
            "images_per_sec": round(2 * bs / dt, 1),
            "mfu_pct": round(100.0 * flops / dt / V5E_PEAK_FLOPS, 2)
            if flops else None,
        }))

        if opts.split:
            s = trainer.init_state(jax.random.PRNGKey(0))
            # hoist the rng split out of the timed loop so the
            # comparison isolates the 2-dispatch-vs-1 fusion effect (a
            # per-iteration fold/split is itself a tiny dispatch that
            # costs ~50 ms/step interleaved on this platform)
            r1, r2 = jax.random.split(rng)
            jax.block_until_ready(r2)
            for _ in range(5):
                s, _, _ = trainer.dis_update(s, img, lbl, img, lbl, r1)
                s, m, _ = trainer.gen_update(s, img, lbl, img, lbl, r2)
            jax.block_until_ready(m["gen_total_loss"])
            t0 = time.perf_counter()
            for i in range(opts.iters):
                s, _, _ = trainer.dis_update(s, img, lbl, img, lbl, r1)
                s, m, _ = trainer.gen_update(s, img, lbl, img, lbl, r2)
            jax.block_until_ready(m["gen_total_loss"])
            dt2 = (time.perf_counter() - t0) / opts.iters
            print(json.dumps({
                "metric": "pretrain_step_split", "batch": bs,
                "compute_dtype": opts.compute_dtype,
                "value": round(dt2 * 1e3, 3), "unit": "ms/step",
                "images_per_sec": round(2 * bs / dt2, 1),
                "fused_speedup": round(dt2 / dt, 3),
            }))

    # vae step at reference batch 128 (64 per domain concatenated)
    state = trainer.init_state(jax.random.PRNGKey(0))
    y = jnp.asarray(np.random.RandomState(2).randn(128, 108), jnp.float32)
    s, m, _ = trainer.vae_update(state, y, rng)
    jax.block_until_ready(m["vae_total_loss"])
    t0 = time.perf_counter()
    for i in range(opts.iters * 5):
        s, m, _ = trainer.vae_update(s, y, jax.random.fold_in(rng, i))
    jax.block_until_ready(m["vae_total_loss"])
    dt = (time.perf_counter() - t0) / (opts.iters * 5)
    print(json.dumps({
        "metric": "vae_step", "batch": 128,
        "value": round(dt * 1e3, 3), "unit": "ms/step",
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
