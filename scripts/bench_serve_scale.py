#!/usr/bin/env python
"""Serving throughput scaling + roofline on one TPU chip.

bench.py pins the per-frame latency headline (the reference's
"real-time" demo path, README.md:17-19, as ONE fused XLA program).
This sweep answers the deployment-sizing questions behind it:

  1. throughput: images/s of the fused frame->crop->regress->decode
     program as batch grows (where does the chip saturate?),
  2. speed-of-light: for each batch, the compiled program's own cost
     model (FLOPs + HBM bytes) against the v5e peaks — how close is
     the measured time to the max(compute, bandwidth) roofline bound?

TIMING METHODOLOGY (this platform): `jax.block_until_ready` is NOT a
reliable sync on the tunneled TPU — after back-to-back dispatches it
returns immediately even though the executions are still queued
server-side (measured: 0.07 ms "blocked" calls for a program whose
real execution is 175 ms; a prior host fetch restores correct
blocking, one queued backlog breaks it again).  The only trustworthy
sync is a HOST FETCH (np.asarray) of an output: the device executes
serially in order, so fetching the last call's output bounds all n
calls.  Per-call time = (n dispatches + one final small fetch) / n,
with n large enough to amortize the ~25 ms tunnel round-trip.

Usage:

    python scripts/bench_serve_scale.py [--batches 1,8,32,64,128,256,512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_FLOPS = 197e12   # bf16, one v5e chip
V5E_HBM_BYTES_S = 819e9   # HBM bandwidth, one v5e chip


def cost_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return flops, byts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,32,64,128,256,512")
    ap.add_argument("--iters", type=int, default=60,
                    help="timed calls at batch<=32; scaled down as "
                         "batch grows to bound wall time")
    ap.add_argument("--warp", default=None, choices=["gather", "einsum"],
                    help="crop warp lowering (default: estimator default)")
    ap.add_argument("--frame-dtype", default="float32",
                    choices=["float32", "uint16"],
                    help="ingest dtype of the raw frames: uint16 is the "
                         "native sensor millimetre format, converted to "
                         "f32 ON DEVICE — half the HBM bytes of the "
                         "dominant 480x640 frame plane")
    ap.add_argument("--chain", type=int, default=16,
                    help="also run K calls chained inside ONE program "
                         "(lax.scan with a live carry dependency): "
                         "per-call time there is DEVICE execution with "
                         "the per-dispatch host/tunnel overhead "
                         "amortized 1/K.  0 disables.")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.data.camera import Camera
    from lsps_tpu.models import build_model
    from lsps_tpu.serve.inference import PoseEstimator

    hyp = default_hyperparameters(reg_dim=108, ch=64)
    key = jax.random.PRNGKey(0)
    kd, kv = jax.random.split(key)
    params = {"dis": build_model(hyp["dis"]).init(kd),
              "vae": build_model(hyp["vae"]).init(kv)}
    est = PoseEstimator(hyp, params, camera=Camera.nyu(),
                        dtype=jnp.bfloat16, warp=args.warp)

    rng = np.random.RandomState(0)
    frame = np.zeros((480, 640), np.float32)
    frame[200:320, 260:380] = rng.uniform(700, 900, (120, 120))
    if args.frame_dtype == "uint16":
        frame = np.rint(frame).astype(np.uint16)  # whole-mm sensor depth
    com = np.array([320.0, 240.0, 800.0], np.float32)
    cube = np.array([300.0, 300.0, 300.0], np.float32)

    def fetch(out):
        # host fetch of the (tiny) joints output = the only real sync
        return np.asarray(jax.tree_util.tree_leaves(out)[0])

    rows = []
    for b in batches:
        frames = jnp.asarray(np.broadcast_to(frame, (b,) + frame.shape))
        coms = jnp.asarray(np.broadcast_to(com, (b, 3)))
        cubes = jnp.asarray(np.broadcast_to(cube, (b, 3)))
        # AOT-compile and time the executable directly (calling the jit
        # wrapper after lower().compile() would compile a second time)
        compiled = est._frames_to_pose.lower(
            est.params, frames, coms, cubes).compile()
        flops, byts = cost_of(compiled)
        for _ in range(3):  # warm: program + arg streaming settles
            fetch(compiled(est.params, frames, coms, cubes))
        # single-request round trip (queue drained): tunnel RTT + exec
        t0 = time.perf_counter()
        fetch(compiled(est.params, frames, coms, cubes))
        rt_ms = (time.perf_counter() - t0) * 1e3
        # sustained: n dispatches, ONE final fetch bounds them all
        n = max(10, args.iters // max(1, b // 32))
        t0 = time.perf_counter()
        for _ in range(n - 1):
            compiled(est.params, frames, coms, cubes)
        fetch(compiled(est.params, frames, coms, cubes))
        ms = (time.perf_counter() - t0) / n * 1e3
        dev_ms = None
        if args.chain:
            # K calls chained in ONE program: the carry perturbs the
            # next call's frames by a dynamic ~1e-30-relative factor so
            # XLA can neither CSE the K calls nor hoist them (numerics
            # unchanged at f32).  The carry/ys must be a FULL reduction
            # over the joints — a single element (j[0,0,0]) would leave
            # batch elements 1..B-1 dead and eligible for DCE/slice
            # sinking, underreporting device_ms.
            K = args.chain

            # params/frames/coms/cubes MUST be explicit arguments: a
            # zero-arg jit closure bakes them into the program as
            # constants, and at batch 256 the 314 MB frames constant
            # blows the tunnel's remote_compile body limit (HTTP 413).
            @jax.jit
            def chained(params, frames, coms, cubes):
                def step(carry, _):
                    if frames.dtype == jnp.uint16:
                        # perturbing uint16 frames would promote them
                        # to f32 and defeat the half-width HBM read;
                        # the f32 coms carry the dependency instead
                        f, c = frames, coms * (1.0 + carry * 1e-30)
                    else:
                        f, c = frames * (1.0 + carry * 1e-30), coms
                    j = est._frames_to_pose(params, f, c, cubes)
                    s = jnp.sum(j)        # keeps every batch element live
                    return s * 1e-3, s

                return jax.lax.scan(step, jnp.float32(0.0), None, length=K)

            cargs = (est.params, frames, coms, cubes)
            for _ in range(3):
                fetch(chained(*cargs))
            nc = max(4, (n + K - 1) // K)
            t0 = time.perf_counter()
            for _ in range(nc - 1):
                chained(*cargs)
            fetch(chained(*cargs))
            dev_ms = (time.perf_counter() - t0) / (nc * K) * 1e3
        imgs_s = b / (ms / 1e3)
        t_flops = flops / V5E_PEAK_FLOPS * 1e3       # ms if MXU-bound
        t_bw = byts / V5E_HBM_BYTES_S * 1e3          # ms if HBM-bound
        bound = max(t_flops, t_bw)
        rows.append({
            "batch": b, "ms": round(ms, 4),
            "ms_per_image": round(ms / b, 4),
            **({"device_ms": round(dev_ms, 4),
                "device_ms_per_image": round(dev_ms / b, 4)}
               if dev_ms is not None else {}),
            "roundtrip_ms": round(rt_ms, 2),
            "images_per_s": round(imgs_s, 1),
            "gflops": round(flops / 1e9, 2),
            "mbytes": round(byts / 1e6, 2),
            "roofline_ms": round(bound, 4),
            "roofline_bound": "hbm" if t_bw >= t_flops else "mxu",
            "pct_of_light": round(100 * bound / ms, 1),
            **({"pct_of_light_device": round(100 * bound / dev_ms, 1)}
               if dev_ms is not None else {}),
            "mfu_pct": round(100 * flops / (ms / 1e3) / V5E_PEAK_FLOPS, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    best = max(rows, key=lambda r: r["images_per_s"])
    print(json.dumps({"peak_images_per_s": best["images_per_s"],
                      "at_batch": best["batch"]}))


if __name__ == "__main__":
    main()
