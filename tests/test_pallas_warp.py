"""The Pallas serve-warp kernel must be bit-identical to the einsum
lowering of the same math (serve/preprocess_jax.crop_normalize_batch
— reference semantics handdetector.py:384-492 + dataset_hand2.py:27-31).
Runs the kernel in interpret mode on CPU; the on-chip A/B lives in
scripts/serve_warp_ab.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from lsps_tpu.data.camera import Camera
from lsps_tpu.ops.pallas.warp import crop_normalize_batch_pallas
from lsps_tpu.serve.preprocess_jax import crop_normalize_batch

CAM = Camera.nyu()


def _frames(b=3, h=480, w=640, seed=0):
    rs = np.random.RandomState(seed)
    frames = np.zeros((b, h, w), np.float32)
    for i in range(b):
        y, x = rs.randint(80, h - 200), rs.randint(80, w - 200)
        frames[i, y:y + 140, x:x + 140] = rs.uniform(650, 950, (140, 140))
    coms = np.stack([[x + 70, y + 70, 800.0] for _ in range(b)]) \
        .astype(np.float32)
    # per-sample coms actually centered on each blob
    coms = np.zeros((b, 3), np.float32)
    for i in range(b):
        ys, xs = np.nonzero(frames[i])
        coms[i] = (xs.mean(), ys.mean(), frames[i][ys, xs].mean())
    cubes = np.tile(np.asarray([300.0, 300.0, 300.0], np.float32),
                    (b, 1))
    return frames, coms, cubes


def test_pallas_warp_matches_einsum_bitwise():
    frames, coms, cubes = _frames()
    ref_crops, ref_M = crop_normalize_batch(
        jnp.asarray(frames), jnp.asarray(coms), jnp.asarray(cubes),
        CAM.fx, CAM.fy, warp="einsum")
    crops, Ms = crop_normalize_batch_pallas(
        jnp.asarray(frames), jnp.asarray(coms), jnp.asarray(cubes),
        CAM.fx, CAM.fy, interpret=True)
    np.testing.assert_array_equal(np.asarray(crops),
                                  np.asarray(ref_crops))
    np.testing.assert_array_equal(np.asarray(Ms), np.asarray(ref_M))


def test_pallas_warp_edge_cases():
    """CoM near the frame border (out-of-source pixels), NaN/inf
    pixels, near/far clamp values — all must match the einsum path."""
    rs = np.random.RandomState(3)
    h, w = 480, 640
    frames = np.zeros((4, h, w), np.float32)
    # blob hanging off the left edge
    frames[0, 100:260, 0:120] = rs.uniform(700, 900, (160, 120))
    # blob at the bottom-right corner
    frames[1, h - 130:, w - 130:] = rs.uniform(700, 900, (130, 130))
    # blob with NaN/inf contamination outside it
    frames[2, 200:330, 250:380] = rs.uniform(700, 900, (130, 130))
    frames[2, 10, 10] = np.nan
    frames[2, 20, 20] = np.inf
    # blob with near/far outliers INSIDE the crop window (clamp paths)
    frames[3, 200:330, 250:380] = rs.uniform(700, 900, (130, 130))
    frames[3, 240:250, 280:290] = 100.0    # < zstart -> zstart
    frames[3, 260:270, 300:310] = 3000.0   # > zend -> far plane

    coms = np.asarray([[40.0, 180.0, 800.0],
                       [float(w - 60), float(h - 60), 800.0],
                       [315.0, 265.0, 800.0],
                       [315.0, 265.0, 800.0]], np.float32)
    cubes = np.tile(np.asarray([300.0, 300.0, 300.0], np.float32),
                    (4, 1))

    ref_crops, _ = crop_normalize_batch(
        jnp.asarray(frames), jnp.asarray(coms), jnp.asarray(cubes),
        CAM.fx, CAM.fy, warp="einsum")
    crops, _ = crop_normalize_batch_pallas(
        jnp.asarray(frames), jnp.asarray(coms), jnp.asarray(cubes),
        CAM.fx, CAM.fy, interpret=True)
    np.testing.assert_array_equal(np.asarray(crops),
                                  np.asarray(ref_crops))
    assert np.all(np.isfinite(np.asarray(crops)))


def test_warp_pallas_routing():
    """``crop_normalize_batch(..., warp="pallas")`` — the serve-path
    selector (PoseEstimator(warp=...) / LSPS_SERVE_WARP env) — routes
    through the kernel and matches the einsum default (interpret mode
    picked automatically off-TPU)."""
    frames, coms, cubes = _frames(seed=11)
    ref_crops, _ = crop_normalize_batch(
        jnp.asarray(frames), jnp.asarray(coms), jnp.asarray(cubes),
        CAM.fx, CAM.fy, warp="einsum")
    crops, _ = crop_normalize_batch(
        jnp.asarray(frames), jnp.asarray(coms), jnp.asarray(cubes),
        CAM.fx, CAM.fy, warp="pallas")
    np.testing.assert_array_equal(np.asarray(crops),
                                  np.asarray(ref_crops))


def test_warp_unknown_rejected():
    frames, coms, cubes = _frames(b=1, seed=5)
    with pytest.raises(ValueError, match="unknown warp"):
        crop_normalize_batch(jnp.asarray(frames), jnp.asarray(coms),
                             jnp.asarray(cubes), CAM.fx, CAM.fy,
                             warp="bogus")
