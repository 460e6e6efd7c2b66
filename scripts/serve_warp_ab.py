#!/usr/bin/env python
"""A/B: serve crop-warp lowerings — one-hot einsum vs fused Pallas.

The north star asks for preprocessing fused "into a single
Pallas-kernelized JAX forward path".  Since round 3 the fused serve
program used one-hot einsums for the NN warp (XLA lowers in-program
gathers to scalar loops here); ops/pallas/warp.py is the Pallas
datapoint: the whole warp + clamp/normalize tail as ONE kernel per
frame.  This measures both lowerings on the real chip, (a) as the
isolated preprocess program and (b) inside the full depth->pose serve
program (PoseEstimator(warp=...)), at batches 1/32/256.

Timing is fetch-synced (host-fetch of an output bounds each window;
block_until_ready does not synchronize on this tunneled platform —
docs/BENCHMARKS.md "SERVING MEASUREMENT CORRECTION"); median + IQR
over windows, same methodology as bench.py.

Usage (TPU): env -u JAX_PLATFORMS python scripts/serve_warp_ab.py \
    [--batch-sizes 1,32,256] [--windows 5]
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
    p.add_argument("--batch-sizes", type=str, default="1,32,256")
    p.add_argument("--windows", type=int, default=5)
    p.add_argument("--iters", type=int, default=40)
    opts = p.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.data.camera import Camera
    from lsps_tpu.serve.inference import PoseEstimator
    from lsps_tpu.serve.preprocess_jax import crop_normalize_batch
    from lsps_tpu.train import LSPSTrainer

    cam = Camera.nyu()
    hyp = default_hyperparameters(reg_dim=42)
    state = LSPSTrainer(hyp).init_state(jax.random.PRNGKey(0))
    # keep params DEVICE-resident: fetching to host numpy makes every
    # dispatch re-upload the ~80 MB trunk through the tunnel (~2.2 s a
    # call, measured — the first run of this script did exactly that)
    params = state["params"]

    rs = np.random.RandomState(0)
    frame = np.zeros((480, 640), np.float32)
    frame[180:330, 250:400] = rs.uniform(650.0, 950.0, (150, 150))
    ys, xs = np.nonzero(frame)
    com = np.asarray([xs.mean(), ys.mean(), frame[ys, xs].mean()],
                     np.float32)
    cube = np.asarray([300.0, 300.0, 300.0], np.float32)

    def fetch(o):
        return np.asarray(jax.tree_util.tree_leaves(o)[0])

    def windows(call, iters):
        vals = []
        for _ in range(opts.windows):
            t0 = time.perf_counter()
            for _ in range(iters - 1):
                call()
            fetch(call())
            vals.append((time.perf_counter() - t0) / iters * 1e3)
        v = np.asarray(vals)
        return (float(np.median(v)),
                float(np.percentile(v, 75) - np.percentile(v, 25)))

    for b in [int(x) for x in opts.batch_sizes.split(",")]:
        fr = jnp.asarray(np.broadcast_to(frame, (b, 480, 640)))
        cm = jnp.asarray(np.broadcast_to(com, (b, 3)))
        cb = jnp.asarray(np.broadcast_to(cube, (b, 3)))
        iters = max(4, min(opts.iters, 2048 // b or 4))

        res = {}
        # (a) isolated preprocess program
        for arm in ("einsum", "pallas"):
            call = jax.jit(lambda f, c, q, _arm=arm: crop_normalize_batch(
                f, c, q, cam.fx, cam.fy, warp=_arm)[0])
            for _ in range(3):
                fetch(call(fr, cm, cb))
            med, iqr = windows(lambda: call(fr, cm, cb), iters)
            res[f"pre_{arm}"] = med
            print(json.dumps({
                "metric": f"preprocess_{arm}", "batch": b,
                "value": round(med, 4), "iqr": round(iqr, 4),
                "unit": "ms/batch",
                "us_per_image": round(med / b * 1e3, 2),
            }), flush=True)

        # (b) full depth->pose serve program
        for arm in ("einsum", "pallas"):
            est = PoseEstimator(hyp, params, camera=cam, warp=arm)
            call = lambda e=est: e._frames_to_pose(e.params, fr, cm, cb)
            for _ in range(3):
                fetch(call())
            med, iqr = windows(call, iters)
            res[f"serve_{arm}"] = med
            print(json.dumps({
                "metric": f"serve_{arm}", "batch": b,
                "value": round(med, 4), "iqr": round(iqr, 4),
                "unit": "ms/batch",
                "ms_per_image": round(med / b, 4),
            }), flush=True)

        print(json.dumps({
            "metric": "pallas_warp_speedup", "batch": b,
            "preprocess": round(res["pre_einsum"] / res["pre_pallas"], 4),
            "serve": round(res["serve_einsum"] / res["serve_pallas"], 4),
            "unit": "x (einsum_ms / pallas_ms; >1 means pallas wins)",
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
