#!/usr/bin/env python
"""Benchmark: serving latency + training throughput on one TPU chip.

Serving: the deployed path of the reference (SURVEY.md §3.4): raw depth
frame -> on-device CoM crop/normalize -> dis.regress_b conv trunk ->
vae.decode, as ONE jitted XLA program at batch 1, full-size NYU model
(ch=64, 36 joints).  North-star target: <= 1 ms/frame on one v5e chip
(BASELINE.json).  ``vs_baseline`` is the speedup vs that 1 ms target
(>1 means faster than target).

Training: the fused pretrain step (dis_update + gen_update as one
program — the reference loop body at src/depth_train.py:153-161) at the
reference batch size 1 and at TPU batch 32, f32 and bf16 compute, with
MFU computed from the compiled program's own cost analysis against the
v5e bf16 peak (197 TFLOP/s).

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

from lsps_tpu.utils.benchutil import V5E_PEAK_FLOPS, flops_of


def _bench_train(jax, jnp, hyp_base, batch, compute_dtype, n_iter=30):
    """(ms/step, images/s, mfu_pct, flops) for the fused pretrain step."""
    from lsps_tpu.train import LSPSTrainer

    hyp = dict(hyp_base)
    hyp["compute_dtype"] = compute_dtype
    trainer = LSPSTrainer(hyp, donate=True)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    ia = jnp.asarray(rs.randn(batch, 128, 128, 1).astype(np.float32) * .2)
    ib = jnp.asarray(rs.randn(batch, 128, 128, 1).astype(np.float32) * .2)
    la = jnp.asarray(rs.randn(batch, 108).astype(np.float32) * .3)
    lb = jnp.asarray(rs.randn(batch, 108).astype(np.float32) * .3)
    rng = jax.random.PRNGKey(1)

    # AOT-compile once and time the compiled executable directly —
    # calling the jit wrapper after lower().compile() would compile the
    # full-size program a SECOND time (the AOT path does not populate
    # the jit dispatch cache), minutes on this host
    compiled = trainer.pretrain_update.lower(state, ia, la, ib, lb,
                                             rng).compile()
    flops = flops_of(compiled)

    # warmup (donation: thread the state linearly).  One call is not
    # enough on this backend — the first few executions of a program are
    # inflated by program/arg streaming, so warm with several.
    for _ in range(5):
        state, m, _ = compiled(state, ia, la, ib, lb, rng)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for i in range(n_iter):
        state, m, _ = compiled(state, ia, la, ib, lb, rng)
    jax.block_until_ready(m)
    ms = (time.perf_counter() - t0) / n_iter * 1e3
    imgs_s = 2 * batch / (ms / 1e3)  # both domains
    mfu = 100.0 * flops / (ms / 1e3) / V5E_PEAK_FLOPS
    return ms, imgs_s, mfu, flops


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
    out = {
        "metric": "depth_to_pose_latency_b1",
        "value": round(best, 4),
        "unit": "ms/frame",
        "vs_baseline": round(baseline_ms / best, 3),
        "f32_ms": round(ms, 4),
        "bf16_ms": round(ms_bf16, 4),
        "pipelined_ms_per_frame": round(min(ms_pipelined, ms_bf16_pipe), 4),
    }

    # training throughput + MFU (full-size NYU pretrain, fused step)
    try:
        b1 = _bench_train(jax, jnp, hyp, 1, "float32", n_iter=50)
        b32 = _bench_train(jax, jnp, hyp, 32, "float32", n_iter=20)
        b32h = _bench_train(jax, jnp, hyp, 32, "bfloat16", n_iter=20)
        out.update({
            "train_b1_ms_per_step": round(b1[0], 3),
            "train_b32_ms_per_step": round(b32[0], 3),
            "train_b32_images_per_s": round(b32[1], 1),
            "train_b32_bf16_ms_per_step": round(b32h[0], 3),
            "train_b32_bf16_images_per_s": round(b32h[1], 1),
            "train_b32_mfu_pct": round(b32[2], 2),
            "train_b32_bf16_mfu_pct": round(b32h[2], 2),
            "train_gflops_per_step_b32": round(b32[3] / 1e9, 1),
        })
    except Exception as e:  # serving metric must still print
        out["train_bench_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
