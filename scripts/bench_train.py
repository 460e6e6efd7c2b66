#!/usr/bin/env python
"""Training-step benchmark on the current backend.

Measures steady-state wall time of the pretrain iteration (dis_update +
gen_update, full-size NYU model) and of vae_update, at the reference
batch sizes and at TPU-friendly ones.  Prints one JSON line per config.

Usage: python scripts/bench_train.py [--batch-sizes 1,8,32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-sizes", type=str, default="1,8,32")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--ch", type=int, default=64)
    opts = p.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.train import LSPSTrainer

    hyp = default_hyperparameters(reg_dim=108, ch=opts.ch)
    trainer = LSPSTrainer(hyp, donate=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    for bs in [int(b) for b in opts.batch_sizes.split(",")]:
        img = jnp.asarray(
            np.random.RandomState(0).randn(bs, 128, 128, 1), jnp.float32)
        lbl = jnp.zeros((bs, 108), jnp.float32)

        # warmup/compile
        s = state
        r1, r2 = jax.random.split(rng)
        s, _, _ = trainer.dis_update(s, img, lbl, img, lbl, r1)
        s, m, _ = trainer.gen_update(s, img, lbl, img, lbl, r2)
        jax.block_until_ready(m["gen_total_loss"])

        t0 = time.perf_counter()
        for i in range(opts.iters):
            r1, r2 = jax.random.split(jax.random.fold_in(rng, i))
            s, _, _ = trainer.dis_update(s, img, lbl, img, lbl, r1)
            s, m, _ = trainer.gen_update(s, img, lbl, img, lbl, r2)
        jax.block_until_ready(m["gen_total_loss"])
        dt = (time.perf_counter() - t0) / opts.iters
        print(json.dumps({
            "metric": "pretrain_step", "batch": bs,
            "value": round(dt * 1e3, 3), "unit": "ms/step",
            "images_per_sec": round(2 * bs / dt, 1),
        }))

        # re-init: donated buffers from the loop invalidated `state`
        state = trainer.init_state(jax.random.PRNGKey(0))

    # vae step at reference batch 128 (64 per domain concatenated)
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
