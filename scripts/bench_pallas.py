#!/usr/bin/env python
"""Microbenchmark: Pallas fused IN+LeakyReLU vs XLA-composed ops.

Forward and forward+backward on the generator's residual-block shape
(B, 32, 32, 256). Prints one JSON line per variant.
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
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--hw", type=int, default=32)
    p.add_argument("--ch", type=int, default=256)
    p.add_argument("--iters", type=int, default=200)
    opts = p.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from lsps_tpu.ops import layers as L
    from lsps_tpu.ops.pallas import norm_act

    x = jnp.asarray(np.random.RandomState(0).randn(
        opts.batch, opts.hw, opts.hw, opts.ch), jnp.float32)

    def composed(x):
        return L.leaky_relu(L.instance_norm(x))

    def run(fn, tag):
        f = jax.jit(fn)
        g = jax.jit(jax.grad(lambda x: jnp.sum(fn(x) ** 2)))
        f(x).block_until_ready()
        g(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(opts.iters):
            out = f(x)
        out.block_until_ready()
        fwd = (time.perf_counter() - t0) / opts.iters * 1e6
        t0 = time.perf_counter()
        for _ in range(opts.iters):
            out = g(x)
        out.block_until_ready()
        bwd = (time.perf_counter() - t0) / opts.iters * 1e6
        print(json.dumps({"metric": f"in_lrelu_{tag}",
                          "fwd_us": round(fwd, 2),
                          "fwd_bwd_us": round(bwd, 2)}))

    run(composed, "xla_composed_autodiff")
    norm_act.set_pallas_enabled(False)
    run(norm_act.fused_instance_norm_leaky_relu, "jnp_custom_vjp")
    if jax.default_backend() == "tpu":
        norm_act.set_pallas_enabled(True)
        run(norm_act.fused_instance_norm_leaky_relu, "pallas_fused")
        norm_act.set_pallas_enabled(None)


if __name__ == "__main__":
    main(sys.argv[1:])
