#!/usr/bin/env python
"""uint16 raw-crop training cache A/B: cache bytes, resident bytes,
H2D stream width, and loader-inclusive wall ms/step at bf16 batch 32.

Round-4 gave the SERVE path native uint16 ingest; this measures the
round-5 TRAINING-side counterpart (VERDICT r4 item 7): the loader's npz
cache and the resident sequence hold uint16 raw-mm codes
(basetypes.encode_dpt_u16 — lossless for whole-mm sensors, reference
importers.py:987-1004), the fused-in-step augment ships the codes over
H2D and decodes in-program (data/augment_jax.py).  Numeric parity is
pinned bit-exact by tests/test_u16_cache.py; this script measures the
resource deltas on the real chip.

The synthetic renderer emits fractional z, so both arms first snap the
crops to integral mm (what a real depth camera delivers); the f32 arm
then runs the unchanged 7-tuple path on the same data.

Usage (TPU): env -u JAX_PLATFORMS python scripts/bench_u16_train.py \
    [--batch 32] [--iters 25] [--frames 256]
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=25)
    p.add_argument("--frames", type=int, default=256)
    opts = p.parse_args(argv)

    import numpy as np

    import jax

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.cli.common import host_fold_in
    from lsps_tpu.data.basetypes import encode_dpt_u16
    from lsps_tpu.data.camera import Camera
    from lsps_tpu.data.importers import DepthImporter
    from lsps_tpu.data.loader import DataLoader, get_dataset
    from lsps_tpu.train import LSPSTrainer
    import lsps_tpu.data.synthetic  # noqa: F401 (registration)

    def make_ds(u16: bool, seed: int):
        spec = {"seed": seed, "class_name": "dataset_hand_synth",
                "root": "", "subset": "train", "joint_subset": "NYU",
                "sample_poses": 0, "augment": True, "docom": False,
                "n_frames": opts.frames, "n_joints": 36}
        ds = get_dataset(spec)
        dpt = np.round(ds.seq.dpt).astype(np.float32)  # integral mm
        if u16:
            enc = encode_dpt_u16(dpt)
            assert enc is not None, "integral-mm crops must code"
            ds.seq = dataclasses.replace(ds.seq, dpt=enc[0],
                                         dpt_vstar=enc[1])
        else:
            ds.seq = dataclasses.replace(ds.seq, dpt=dpt)
        return ds

    # ---- cache bytes (identical sequence, both storage forms) -------
    ds = make_ds(False, 5)
    imp = DepthImporter(Camera.nyu(), use_cache=True)
    with tempfile.TemporaryDirectory() as tmpd:
        pu = os.path.join(tmpd, "u16.npz")
        pf = os.path.join(tmpd, "f32.npz")
        imp._save_cache(pu, ds.seq)  # default: u16-coded when lossless
        os.environ["LSPS_CACHE_F32"] = "1"
        imp._save_cache(pf, ds.seq)
        del os.environ["LSPS_CACHE_F32"]
        b_u16, b_f32 = os.path.getsize(pu), os.path.getsize(pf)
    print(json.dumps({
        "metric": "train_cache_npz_bytes", "frames": opts.frames,
        "f32": b_f32, "u16": b_u16,
        "ratio": round(b_f32 / b_u16, 3)}), flush=True)

    # ---- resident + per-step H2D bytes ------------------------------
    ds_u = make_ds(True, 5)
    print(json.dumps({
        "metric": "resident_dpt_bytes", "frames": opts.frames,
        "f32": int(ds.seq.dpt.nbytes), "u16": int(ds_u.seq.dpt.nbytes),
        # src arrays shipped per step, both domains (a + b)
        "h2d_src_bytes_per_step_f32": int(
            2 * 4 * opts.batch * np.prod(ds.seq.dpt.shape[1:])),
        "h2d_src_bytes_per_step_u16": int(
            2 * 2 * opts.batch * np.prod(ds_u.seq.dpt.shape[1:]))}),
        flush=True)

    # ---- loader-inclusive wall ms/step, bf16, fused-in-step ---------
    hyp = default_hyperparameters(reg_dim=42)
    hyp["compute_dtype"] = "bfloat16"

    def wall(u16: bool):
        trainer = LSPSTrainer(hyp, donate=True)
        state = trainer.init_state(jax.random.PRNGKey(0))
        la = DataLoader(make_ds(u16, 5), opts.batch, shuffle=True,
                        seed=1, fast=True, fast_backend="step")
        lb = DataLoader(make_ds(u16, 6), opts.batch, shuffle=True,
                        seed=2, fast=True, fast_backend="step")
        assert la.raw and lb.raw
        rng = jax.random.PRNGKey(3)
        it, timed, t0, warm = 0, 0, None, 3
        while timed < opts.iters:
            for ba, bb in zip(iter(la), iter(lb)):
                raw_a, lbl_a = ba[0], ba[1]
                raw_b, lbl_b = bb[0], bb[1]
                if lbl_a.shape[0] != opts.batch \
                        or lbl_b.shape[0] != opts.batch:
                    continue
                assert (len(raw_a) == 8) == u16
                rng = host_fold_in(rng, it)
                state, m, _ = trainer.pretrain_update_raw(
                    state, raw_a, lbl_a, raw_b, lbl_b, rng,
                    with_viz=False)
                it += 1
                if it == warm:
                    jax.block_until_ready(m["gen_total_loss"])
                    t0 = time.perf_counter()
                elif it > warm:
                    timed += 1
                    if timed >= opts.iters:
                        break
        jax.block_until_ready(m["gen_total_loss"])
        return (time.perf_counter() - t0) / timed * 1e3

    for u16 in (False, True):
        ms = wall(u16)
        print(json.dumps({
            "metric": f"train_b{opts.batch}_bf16_wall_"
                      f"{'u16' if u16 else 'f32'}_cache",
            "value": round(ms, 3), "unit": "ms/step",
            "images_per_s": round(2 * opts.batch / (ms / 1e3), 1)}),
            flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
