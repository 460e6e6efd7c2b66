"""Device-resident detection vs the host-side HandDetector.

The jittable depth-sweep + CoM refinement (serve/detect_jax.py, porting
reference handdetector.py:571-636 / 548-569) must agree with the host
detector on single-hand frames — then the full raw-frame live path runs
as one XLA program (PoseEstimator.predict_raw).
"""

import numpy as np
import pytest

import jax

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.data.camera import Camera
from lsps_tpu.data.detector import HandDetector
from lsps_tpu.data.synthetic import render_hand_depth
from lsps_tpu.models import build_model
from lsps_tpu.serve.detect_jax import device_detect, device_detect_batch
from lsps_tpu.serve.inference import PoseEstimator

CAM = Camera.nyu()
CUBE = (300.0, 300.0, 300.0)


def _frames(n, seed=3):
    gen = np.random.RandomState(seed)
    frames, coms3d = [], []
    for i in range(n):
        com3d = np.array([40.0 * i - 20.0, 15.0 * i - 10.0,
                          720.0 + 40.0 * i], np.float32)
        dpt, _ = render_hand_depth(CAM, com3d, 36, gen)
        frames.append(dpt.astype(np.float32))
        coms3d.append(com3d)
    return np.stack(frames), np.stack(coms3d)


def test_device_detect_matches_host():
    frames, _ = _frames(3)
    for dpt in frames:
        hd = HandDetector(dpt.copy(), CAM.fx, CAM.fy)
        com_host, _ = hd.detect(size=CUBE, do_hand_size=False)
        com_dev = np.asarray(device_detect(dpt, np.asarray(CUBE),
                                           fx=CAM.fx, fy=CAM.fy))
        assert not np.allclose(com_host, 0), "host detector failed"
        assert not np.allclose(com_dev, 0), "device detector failed"
        # sub-pixel agreement in u/v, mm-level in z
        np.testing.assert_allclose(com_dev[:2], com_host[:2], atol=2.0)
        np.testing.assert_allclose(com_dev[2], com_host[2], atol=3.0)


def test_device_detect_empty_frame_returns_zero():
    empty = np.zeros((480, 640), np.float32)
    com = np.asarray(device_detect(empty, np.asarray(CUBE),
                                   fx=CAM.fx, fy=CAM.fy))
    np.testing.assert_array_equal(com, 0.0)


def test_device_detect_speckle_rejected():
    """Scattered single-pixel noise must not qualify as a blob (the
    interior-pixel test stands in for contourArea > 200)."""
    rs = np.random.RandomState(0)
    dpt = np.zeros((480, 640), np.float32)
    idx = rs.choice(480 * 640, 300, replace=False)
    dpt.flat[idx] = 500.0  # 300 isolated speckles at one depth
    com = np.asarray(device_detect(dpt, np.asarray(CUBE),
                                   fx=CAM.fx, fy=CAM.fy))
    np.testing.assert_array_equal(com, 0.0)


def test_predict_raw_end_to_end():
    """Raw frames -> joints with on-device detection: one program, and
    consistent with predict_frames fed the device-detected CoMs."""
    hyp = default_hyperparameters(reg_dim=108, small=True)
    hyp["dis"]["ch"] = 4
    hyp["gen"]["ch"] = 4
    kd, kv = jax.random.split(jax.random.PRNGKey(0))
    params = {"dis": build_model(hyp["dis"]).init(kd),
              "vae": build_model(hyp["vae"]).init(kv)}
    est = PoseEstimator(hyp, params, camera=CAM)

    frames, _ = _frames(2, seed=5)
    cubes = np.full((2, 3), 300.0, np.float32)
    joints, coms = est.predict_raw(frames, cubes, return_coms=True)
    assert joints.shape == (2, 36, 3) and np.isfinite(joints).all()
    assert not np.allclose(coms, 0)

    want = est.predict_frames(frames, coms, cubes)
    np.testing.assert_allclose(joints, want, rtol=1e-5, atol=1e-4)

    # detection centered near the rendered hand: decoded joints'
    # centroid depth lands in the hand's depth band
    batch_coms = np.asarray(device_detect_batch(frames, cubes,
                                                CAM.fx, CAM.fy))
    np.testing.assert_allclose(batch_coms, coms, rtol=1e-5, atol=1e-4)
