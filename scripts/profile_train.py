#!/usr/bin/env python
"""Profile the fused pretrain step on the current backend and print the
top ops by self-time — headless (parses the xplane with
tensorboard_plugin_profile, no TensorBoard UI needed).

Usage: python scripts/profile_train.py [--batch 32]
       [--compute-dtype bfloat16] [--steps 5] [--top 25]
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--ch", type=int, default=64)
    p.add_argument("--compute-dtype", type=str, default="float32")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--logdir", type=str, default="/tmp/lsps_profile")
    opts = p.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.train import LSPSTrainer

    hyp = default_hyperparameters(reg_dim=108, ch=opts.ch)
    hyp["compute_dtype"] = opts.compute_dtype
    trainer = LSPSTrainer(hyp, donate=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    bs = opts.batch
    img = jnp.asarray(np.random.RandomState(0).randn(bs, 128, 128, 1),
                      jnp.float32)
    lbl = jnp.zeros((bs, 108), jnp.float32)
    rng = jax.random.PRNGKey(1)

    # compile + warm
    for _ in range(3):
        state, m, _ = trainer.pretrain_update(state, img, lbl, img, lbl,
                                              rng)
    jax.block_until_ready(m["gen_total_loss"])

    # fixed rng: the production loop folds on the HOST (cli/common.
    # host_fold_in), so the trace must contain exactly one device
    # program per step — a device fold here would reintroduce the
    # interleave artifact this tool exists to diagnose
    with jax.profiler.trace(opts.logdir):
        for i in range(opts.steps):
            state, m, _ = trainer.pretrain_update(state, img, lbl, img,
                                                  lbl, rng)
        jax.block_until_ready(m["gen_total_loss"])

    xplanes = sorted(glob.glob(os.path.join(
        opts.logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not xplanes:
        print("no xplane produced", file=sys.stderr)
        return 1
    xplane = xplanes[-1]

    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data([xplane], "framework_op_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", errors="replace")
    # the tool emits JSON-ish table data; fall back to raw print if the
    # schema shifts between versions
    try:
        tables = json.loads(data)
        rows = None
        # generic: find the first entry with cols/rows
        cand = tables if isinstance(tables, list) else [tables]
        for t in cand:
            if isinstance(t, dict) and "rows" in t and "cols" in t:
                rows = t
                break
        if rows is None:
            raise ValueError("no table")
        cols = [c.get("label") or c.get("id") for c in rows["cols"]]
        want = [i for i, c in enumerate(cols) if c and any(
            k in c.lower() for k in ("operation", "type", "self", "total",
                                     "occurrences", "flop"))]
        print("\t".join(cols[i] for i in want))
        for r in rows["rows"][:opts.top]:
            vals = [str(r["c"][i].get("v")) for i in want]
            print("\t".join(vals))
    except Exception as e:
        print(f"(table parse failed: {e}; raw head below)")
        print(data[:4000])
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
