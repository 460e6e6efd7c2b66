"""Native C++ kernel tests: build, warp parity vs cv2, fused pipeline
agreement with the numpy/cv2 reference path."""

import numpy as np
import pytest

from lsps_tpu import native


def test_library_builds():
    assert native.available(), "g++ build of liblsps_native.so failed"


def test_warp_matches_cv2(rng):
    import cv2

    src = rng.uniform(600, 900, (64, 64)).astype(np.float32)
    M = np.array([[0.8, 0.1, 3.0], [-0.05, 0.9, 2.0], [0, 0, 1]],
                 np.float64)
    ours = native.warp_perspective_nn(src, np.linalg.inv(M), (64, 64),
                                      border=0.0)
    theirs = cv2.warpPerspective(src, M, (64, 64),
                                 flags=cv2.INTER_NEAREST,
                                 borderMode=cv2.BORDER_CONSTANT,
                                 borderValue=0.0)
    agree = np.mean(ours == theirs)
    assert agree > 0.98, f"only {agree:.2%} pixels agree with cv2"


def test_fused_recrop_normalize_matches_numpy_path(rng):
    n, h, w = 3, 32, 32
    src = rng.uniform(600, 900, (n, h, w)).astype(np.float32)
    src[:, :4, :4] = 0.0
    minv = np.tile(np.eye(3, dtype=np.float64)[None], (n, 1, 1))
    minv[:, 0, 2] = rng.uniform(-3, 3, n)  # translations
    com_z = np.full(n, 750.0, np.float32)
    cube_z = np.full(n, 300.0, np.float32)
    premax = src.reshape(n, -1).max(1)
    zstart = com_z - 150.0
    zend = com_z + 150.0

    out = native.fused_recrop_normalize_batch(src, minv, com_z, cube_z,
                                              premax, zstart, zend)
    assert out.shape == src.shape
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5

    # reference: per-sample numpy chain
    for b in range(n):
        v = native.warp_perspective_nn(src[b], minv[b], (h, w), 0.0)
        far, near = com_z[b] + 150.0, com_z[b] - 150.0
        v = v.copy()
        v[np.isclose(v, 32000.0)] = 0.0
        v[(v != 0) & (v < zstart[b])] = zstart[b]
        v[(v != 0) & (v > zend[b])] = 0.0
        v[(v == premax[b]) | (v == 0)] = far
        v = np.clip(v, near, far)
        ref = (v - com_z[b]) / 150.0
        np.testing.assert_allclose(out[b], ref, atol=1e-5)


def test_normalize_batch_matches_reference(rng):
    from lsps_tpu.data.augment import normalize

    n = 4
    src = rng.uniform(600, 900, (n, 16, 16)).astype(np.float32)
    src[:, 0, 0] = 0.0
    com = np.stack([np.zeros(n), np.zeros(n),
                    rng.uniform(700, 800, n)], 1).astype(np.float32)
    cube = np.full((n, 3), 300.0, np.float32)
    out = native.normalize_batch(src, com[:, 2], cube[:, 2])
    for b in range(n):
        ref = normalize(src[b].copy(), com[b], cube[b])
        np.testing.assert_allclose(out[b], ref, atol=1e-6)
