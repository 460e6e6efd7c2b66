#!/usr/bin/env python
"""Benchmark: fused depth->pose inference latency on one TPU chip.

Measures the deployed path of the reference (SURVEY.md §3.4): raw depth
frame -> on-device CoM crop/normalize -> dis.regress_b conv trunk ->
vae.decode, as ONE jitted XLA program at batch 1, full-size NYU model
(ch=64, 36 joints).  North-star target: <= 1 ms/frame on one v5e chip
(BASELINE.json).  ``vs_baseline`` is the speedup vs that 1 ms target
(>1 means faster than target).

Prints exactly one JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.data.camera import Camera
    from lsps_tpu.serve.inference import PoseEstimator

    hyp = default_hyperparameters(reg_dim=108, ch=64)
    cam = Camera.nyu()

    # init full-size params
    from lsps_tpu.models import build_model

    key = jax.random.PRNGKey(0)
    kd, kv = jax.random.split(key)
    dis = build_model(hyp["dis"])
    vae = build_model(hyp["vae"])
    params = {"dis": dis.init(kd), "vae": vae.init(kv)}

    est = PoseEstimator(hyp, params, camera=cam)
    est_bf16 = PoseEstimator(hyp, params, camera=cam, dtype=jnp.bfloat16)

    # one realistic frame
    rng = np.random.RandomState(0)
    frame = np.zeros((480, 640), np.float32)
    frame[200:320, 260:380] = rng.uniform(700, 900, (120, 120))
    com = np.array([320.0, 240.0, 800.0], np.float32)
    cube = np.array([300.0, 300.0, 300.0], np.float32)

    frames = jnp.asarray(frame[None])
    coms = jnp.asarray(com[None])
    cubes = jnp.asarray(cube[None])

    # compile + warmup
    out = est._frames_to_pose(est.params, frames, coms, cubes)
    out.block_until_ready()

    def timed(e, n_iter=200):
        # warmup/compile
        e._frames_to_pose(e.params, frames, coms, cubes).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(n_iter):
            e._frames_to_pose(e.params, frames, coms,
                              cubes).block_until_ready()
        blocked = (time.perf_counter() - t0) / n_iter * 1e3
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = e._frames_to_pose(e.params, frames, coms, cubes)
        out.block_until_ready()
        pipelined = (time.perf_counter() - t0) / n_iter * 1e3
        return blocked, pipelined

    ms, ms_pipelined = timed(est)
    ms_bf16, ms_bf16_pipe = timed(est_bf16)

    baseline_ms = 1.0  # north-star target (BASELINE.json)
    best = min(ms, ms_bf16)
    print(json.dumps({
        "metric": "depth_to_pose_latency_b1",
        "value": round(best, 4),
        "unit": "ms/frame",
        "vs_baseline": round(baseline_ms / best, 3),
        "f32_ms": round(ms, 4),
        "bf16_ms": round(ms_bf16, 4),
        "pipelined_ms_per_frame": round(min(ms_pipelined, ms_bf16_pipe), 4),
    }))


if __name__ == "__main__":
    main()
