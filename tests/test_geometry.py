import numpy as np
import pytest

from lsps_tpu.data.camera import Camera
from lsps_tpu.data import transformations as T


@pytest.mark.parametrize("cam", [Camera.nyu(), Camera.icvl(), Camera.msra()])
def test_projection_roundtrip(cam, rng):
    uvd = np.stack([
        rng.uniform(0, cam.depth_map_size[0], 100),
        rng.uniform(0, cam.depth_map_size[1], 100),
        rng.uniform(300, 1500, 100)], axis=-1).astype(np.float32)
    xyz = cam.img_to_3d(uvd)
    back = cam.to_img(xyz)
    np.testing.assert_allclose(back, uvd, rtol=1e-5, atol=1e-3)


def test_projection_reference_values():
    # NYU intrinsics (reference importers.py:961): y axis flipped
    cam = Camera.nyu()
    xyz = cam.img_to_3d(np.array([320.0, 240.0, 1000.0]))
    np.testing.assert_allclose(xyz, [0.0, 0.0, 1000.0], atol=1e-6)
    # a point right+below the principal point has +x, -y in metric space
    xyz = cam.img_to_3d(np.array([420.0, 340.0, 1000.0]))
    assert xyz[0] > 0 and xyz[1] < 0
    # ICVL: y not flipped (reference importers.py:84-95)
    cam2 = Camera.icvl()
    xyz2 = cam2.img_to_3d(np.array([260.0, 220.0, 1000.0]))
    assert xyz2[0] > 0 and xyz2[1] > 0


def test_zero_depth_maps_to_principal_point():
    cam = Camera.nyu()
    out = cam.to_img(np.array([50.0, 20.0, 0.0]))
    np.testing.assert_allclose(out, [cam.ux, cam.uy, 0.0])


def test_transform_points_2d_identity_and_affine(rng):
    pts = rng.randn(7, 3).astype(np.float32)
    np.testing.assert_allclose(T.transform_points_2d(pts, np.eye(3)), pts,
                               rtol=1e-6)
    M = np.array([[2.0, 0, 5], [0, 3.0, -1], [0, 0, 1]], np.float32)
    out = T.transform_points_2d(pts, M)
    np.testing.assert_allclose(out[:, 0], pts[:, 0] * 2 + 5, rtol=1e-5)
    np.testing.assert_allclose(out[:, 1], pts[:, 1] * 3 - 1, rtol=1e-5)
    np.testing.assert_allclose(out[:, 2], pts[:, 2], rtol=1e-6)


def test_rotate_points_2d(rng):
    pts = np.array([[2.0, 0.0, 7.0]], np.float32)
    out = T.rotate_points_2d(pts, np.zeros(2, np.float32), 90.0)
    np.testing.assert_allclose(out[0], [0.0, 2.0, 7.0], atol=1e-6)
    # rotation preserves distance to center
    pts = rng.randn(10, 3).astype(np.float32)
    c = np.array([1.0, -2.0], np.float32)
    out = T.rotate_points_2d(pts, c, 37.0)
    d0 = np.linalg.norm(pts[:, :2] - c, axis=1)
    d1 = np.linalg.norm(out[:, :2] - c, axis=1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5)


def test_rotate_points_3d_preserves_norm(rng):
    pts = rng.randn(10, 3).astype(np.float32)
    c = np.zeros(3, np.float32)
    out = T.rotate_points_3d(pts, c, 10.0, 20.0, 30.0)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1),
                               np.linalg.norm(out, axis=1), rtol=1e-5)


def test_crop_transform_roundtrip_through_M(rng):
    """The affine M returned by the detector must map original image coords
    to crop coords consistently with transform_points_2d."""
    M = np.array([[0.5, 0, -10], [0, 0.5, -20], [0, 0, 1]], np.float32)
    pts = rng.uniform(0, 300, (5, 3)).astype(np.float32)
    out = T.transform_points_2d(pts, M)
    back = T.transform_points_2d(out, np.linalg.inv(M))
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-3)
