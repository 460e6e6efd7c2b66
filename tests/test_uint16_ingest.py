"""uint16 millimetre frame ingest across the serving stack (round-4
VERDICT #6): depth cameras emit uint16 mm natively, the serve program
is HBM-bound with the 480x640 frame plane dominant (docs/BENCHMARKS.md),
so accepting uint16 and converting ON DEVICE halves the ingest bytes.

Depth values are whole millimetres <= 6500, exactly representable in
both uint16 and float32 — so the uint16 path must be BIT-identical to
the f32 path, not merely close.  Covered surfaces: PoseEstimator
(predict_frames / predict_raw), the MicroBatcher's dtype grouping, the
HTTP daemon's passthrough, and the AOT export artifact.  The reference
has no serving story at all (SURVEY.md §3.4)."""

import threading

import numpy as np

import jax

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.data.camera import Camera
from lsps_tpu.data.synthetic import render_hand_depth
from lsps_tpu.models import build_model
from lsps_tpu.serve.inference import PoseEstimator
from lsps_tpu.serve.server import MicroBatcher, PoseServer

HYP = default_hyperparameters(reg_dim=108, small=True)
HYP["dis"]["ch"] = 4
HYP["gen"]["ch"] = 4


def _setup(n=3):
    cam = Camera.nyu()
    gen = np.random.RandomState(11)
    frames, coms = [], []
    for i in range(n):
        com3d = np.array([15.0 * i, 0.0, 750.0], np.float32)
        dpt, _ = render_hand_depth(cam, com3d, 36, gen)
        # whole-mm depth: the native sensor quantization (synthetic
        # frames are float; a real camera never emits fractional mm)
        frames.append(np.rint(dpt).astype(np.float32))
        coms.append(cam.to_img(com3d).astype(np.float32))
    kd, kv = jax.random.split(jax.random.PRNGKey(0))
    params = {"dis": build_model(HYP["dis"]).init(kd),
              "vae": build_model(HYP["vae"]).init(kv)}
    est = PoseEstimator(HYP, params, camera=cam)
    return est, np.stack(frames), np.stack(coms)


def test_estimator_uint16_matches_f32():
    est, frames, coms = _setup()
    cubes = np.full((3, 3), 300.0, np.float32)
    f32 = est.predict_frames(frames, coms, cubes)
    u16 = est.predict_frames(frames.astype(np.uint16), coms, cubes)
    # whole-mm depths are exact in both dtypes; the device-side
    # astype(f32) reproduces the identical program input
    np.testing.assert_array_equal(f32, u16)


def test_estimator_raw_uint16_matches_f32():
    est, frames, _ = _setup()
    f32, coms_f = est.predict_raw(frames, return_coms=True)
    u16, coms_u = est.predict_raw(frames.astype(np.uint16),
                                  return_coms=True)
    np.testing.assert_array_equal(f32, u16)
    np.testing.assert_array_equal(coms_f, coms_u)


def test_microbatcher_never_mixes_dtypes():
    """uint16 and f32 frames are different XLA programs; the batcher
    must group them apart even when they share a window."""
    calls = []

    def run_group(frames, coms, cubes):
        calls.append(frames.dtype.str)
        out = np.zeros((frames.shape[0], 4, 3), np.float32)
        out[:, 0, 0] = np.asarray(frames, np.float32).reshape(
            frames.shape[0], -1).mean(axis=1)
        return out, None

    b = MicroBatcher(run_group, window_ms=0.0, max_batch=8)
    b._stop = True
    b._thread.join(timeout=5.0)
    b._stop = False
    from lsps_tpu.serve.server import _Pending

    it_f = _Pending(np.full((1, 8, 8), 3.0, np.float32),
                    np.array([[0.0, 0, 700]], np.float32),
                    np.full((1, 3), 300.0, np.float32))
    it_u = _Pending(np.full((1, 8, 8), 5, np.uint16),
                    np.array([[0.0, 0, 700]], np.float32),
                    np.full((1, 3), 300.0, np.float32))
    b._q.put(it_f)
    b._q.put(it_u)
    b._round()
    assert sorted(calls) == sorted(["<f4", "<u2"])  # two separate calls
    np.testing.assert_allclose(it_f.joints[0, 0, 0], 3.0, rtol=1e-6)
    np.testing.assert_allclose(it_u.joints[0, 0, 0], 5.0, rtol=1e-6)


def test_server_passes_uint16_through():
    """PoseServer.predict must hand uint16 frames to the estimator
    natively (no host f32 upcast)."""
    seen = []

    class _Rec:
        n_joints = 4

        def predict_frames(self, frames, coms, cubes):
            seen.append(frames.dtype)
            return np.zeros((frames.shape[0], 4, 3), np.float32)

    server = PoseServer(_Rec(), batch_window_ms=None)
    frames = np.full((2, 8, 8), 700, np.uint16)
    coms = np.tile(np.array([[0.0, 0, 700]], np.float32), (2, 1))
    server.predict(frames, coms, None)
    assert seen == [np.dtype(np.uint16)]


def test_export_uint16_artifact_matches_f32(tmp_path):
    from lsps_tpu.serve.export import (ArtifactPoseEstimator,
                                       export_pose_program,
                                       save_pose_program)

    est, frames, coms = _setup(2)
    h, w = frames.shape[1:]
    cubes = np.full((2, 3), 300.0, np.float32)

    import jax.numpy as jnp

    p32 = tmp_path / "pose_f32.lsps"
    p16 = tmp_path / "pose_u16.lsps"
    save_pose_program(str(p32), export_pose_program(
        est, batch=2, frame_shape=(h, w)))
    save_pose_program(str(p16), export_pose_program(
        est, batch=2, frame_shape=(h, w), frame_dtype=jnp.uint16))

    a32 = ArtifactPoseEstimator(str(p32))
    a16 = ArtifactPoseEstimator(str(p16))
    assert a32.frame_dtype == np.float32
    assert a16.frame_dtype == np.uint16

    want = a32.predict_frames(frames, coms, cubes)
    got = a16.predict_frames(frames.astype(np.uint16), coms, cubes)
    np.testing.assert_array_equal(want, got)
    # whole-mm f32 input to the uint16 artifact casts losslessly too
    got2 = a16.predict_frames(frames, coms, cubes)
    np.testing.assert_array_equal(want, got2)

    # LOSSY float input must raise, not silently truncate/wrap: each of
    # fractional mm, negative sentinels, and out-of-range values
    import pytest

    for poison in (0.5, -1.0, 70000.0, np.nan):
        bad = frames.copy()
        bad[0, 0, 0] = poison
        with pytest.raises(ValueError, match="losslessly"):
            a16.predict_frames(bad, coms, cubes)
    # the f32 artifact still accepts uint16 input (int->float is exact)
    np.testing.assert_array_equal(
        want, a32.predict_frames(frames.astype(np.uint16), coms, cubes))
