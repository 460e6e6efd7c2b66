#!/usr/bin/env python
"""Microbenchmark: Pallas fused IN+LeakyReLU vs XLA-composed ops.

Forward and forward+backward on the generator's residual-block shape
(B, 32, 32, 256). Prints one JSON line per variant.

TIMING: `block_until_ready` is not a reliable sync on the tunneled
platform (see docs/BENCHMARKS.md measurement-correction section), and a
per-call host fetch would be swamped by the ~25 ms tunnel round-trip at
microsecond kernel scale.  Slope timing instead: run n1 and n2
dispatches, each bounded by ONE final host fetch (device executes
serially, so the fetch bounds the whole run); per-call time =
(T2 - T1) / (n2 - n1) — the round-trip and constant overheads cancel.
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
    p.add_argument("--iters", type=int, default=400,
                   help="n1; n2 = 4*n1")
    opts = p.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from lsps_tpu.ops import layers as L
    from lsps_tpu.ops.pallas import norm_act

    x = jnp.asarray(np.random.RandomState(0).randn(
        opts.batch, opts.hw, opts.hw, opts.ch), jnp.float32)

    def fetch(o):
        return np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    def slope_us(call):
        # warm (program + arg streaming), queue drained by the fetch
        for _ in range(3):
            fetch(call())
        n1, n2 = opts.iters, 4 * opts.iters
        ts = []
        for n in (n1, n2):
            t0 = time.perf_counter()
            for _ in range(n - 1):
                call()
            fetch(call())
            ts.append(time.perf_counter() - t0)
        return (ts[1] - ts[0]) / (n2 - n1) * 1e6

    def run(fn, tag):
        f = jax.jit(fn)
        g = jax.jit(jax.grad(lambda x: jnp.sum(fn(x) ** 2)))
        fwd = slope_us(lambda: f(x))
        bwd = slope_us(lambda: g(x))
        print(json.dumps({"metric": f"in_lrelu_{tag}",
                          "fwd_us": round(fwd, 2),
                          "fwd_bwd_us": round(bwd, 2)}), flush=True)

    def composed(x):
        return L.leaky_relu(L.instance_norm(x))

    run(composed, "xla_composed_autodiff")
    norm_act.set_pallas_enabled(False)
    run(norm_act.fused_instance_norm_leaky_relu, "jnp_custom_vjp")
    if jax.default_backend() == "tpu":
        norm_act.set_pallas_enabled(True)
        run(norm_act.fused_instance_norm_leaky_relu, "pallas_fused")
        norm_act.set_pallas_enabled(None)

    # block-level IN + residual add (round-3 kernel): composed vs fused,
    # on the same shape, f32 and bf16
    r = jnp.asarray(np.random.RandomState(1).randn(
        opts.batch, opts.hw, opts.hw, opts.ch), jnp.float32)

    def run2(fn, tag, xx, rr):
        f = jax.jit(fn)
        g = jax.jit(jax.grad(
            lambda a, b: jnp.sum(fn(a, b).astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        fwd = slope_us(lambda: f(xx, rr))
        bwd = slope_us(lambda: g(xx, rr))
        print(json.dumps({"metric": f"in_residual_{tag}",
                          "fwd_us": round(fwd, 2),
                          "fwd_bwd_us": round(bwd, 2)}), flush=True)

    def composed2(a, b):
        return L.instance_norm(a) + b

    for dtype, dtag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        xx, rr = x.astype(dtype), r.astype(dtype)
        run2(composed2, f"xla_composed_{dtag}", xx, rr)
        if jax.default_backend() == "tpu":
            norm_act.set_pallas_enabled(True)
            run2(norm_act.fused_instance_norm_residual,
                 f"pallas_fused_{dtag}", xx, rr)
            norm_act.set_pallas_enabled(None)


if __name__ == "__main__":
    main(sys.argv[1:])
