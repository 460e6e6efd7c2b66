"""Data-layer tests: detector crop math, normalization/augmentation
semantics, synthetic dataset end-to-end, loader batching, pose sampling."""

import numpy as np
import pytest

from lsps_tpu.data.augment import augment_crop, normalize
from lsps_tpu.data.camera import Camera
from lsps_tpu.data.detector import HandDetector
from lsps_tpu.data.importers import DepthImporter
from lsps_tpu.data.loader import DataLoader, get_dataset
from lsps_tpu.data.synthetic import SyntheticImporter, render_hand_depth
from lsps_tpu.data.transformations import transform_points_2d

import lsps_tpu.data.synthetic  # noqa: F401  (register datasets)


def _synthetic_frame(seed=0, com_z=800.0):
    cam = Camera.nyu()
    gen = np.random.RandomState(seed)
    com3d = np.array([20.0, -10.0, com_z], np.float32)
    dpt, joints3d = render_hand_depth(cam, com3d, 36, gen)
    return cam, dpt, joints3d, com3d


def test_detector_crop_shape_and_transform():
    cam, dpt, joints3d, com3d = _synthetic_frame()
    imp = DepthImporter(cam)
    hd = HandDetector(dpt, cam.fx, cam.fy, importer=imp)
    com_img = cam.to_img(com3d)
    crop, M, com = hd.crop_area_3d(com=com_img, size=(300, 300, 300),
                                   dsize=(128, 128))
    assert crop.shape == (128, 128)
    assert crop.dtype == np.float32
    # the CoM must land at the crop center under M
    center = transform_points_2d(com_img[None], M)[0]
    assert abs(center[0] - 64) < 2 and abs(center[1] - 64) < 2
    # depth content preserved around the hand
    assert (np.abs(crop - com3d[2]) < 150).any()


def test_com_to_bounds_rounding():
    cam, dpt, _, com3d = _synthetic_frame()
    hd = HandDetector(dpt, cam.fx, cam.fy)
    com_img = cam.to_img(com3d)
    xs, xe, ys, ye, zs, ze = hd.com_to_bounds(com_img, (300, 300, 300))
    assert zs == pytest.approx(com3d[2] - 150)
    assert ze == pytest.approx(com3d[2] + 150)
    # bbox width in px ~ size/z*fx
    assert (xe - xs) == pytest.approx(300 / com3d[2] * cam.fx, abs=2)


def test_calculate_com_weighted():
    dpt = np.zeros((20, 20), np.float32)
    dpt[5, 5] = 500.0
    dpt[5, 7] = 700.0
    hd = HandDetector(dpt.copy(), 100, 100)
    com = hd.calculate_com(dpt)
    assert com[1] == pytest.approx(5.0)
    assert com[0] == pytest.approx(6.0)
    assert com[2] == pytest.approx(600.0)


def test_normalize_inverse():
    com = np.array([0, 0, 800.0], np.float32)
    cube = np.array([300, 300, 300], np.float32)
    img = np.zeros((4, 4), np.float32)
    img[0, 0] = 800.0   # com depth -> 0
    img[1, 1] = 950.0   # far face -> +1
    img[2, 2] = 650.0   # near face -> -1
    out = normalize(img.copy(), com, cube)
    assert out[0, 0] == pytest.approx(0.0)
    assert out[1, 1] == pytest.approx(1.0)
    assert out[2, 2] == pytest.approx(-1.0)
    assert out[3, 3] == pytest.approx(1.0)  # background 0 -> far plane


def test_augment_crop_modes_produce_valid_output():
    cam, dpt, joints3d, com3d = _synthetic_frame()
    imp = DepthImporter(cam)
    hd = HandDetector(dpt, cam.fx, cam.fy, importer=imp)
    com_img = cam.to_img(com3d)
    crop, M, com = hd.crop_area_3d(com=com_img, size=(300, 300, 300))
    cube = np.array([300, 300, 300], np.float32)
    gt3d_crop = (joints3d - com3d).astype(np.float32)
    norm = normalize(crop.copy(), cam.to_img(com3d), cube)

    for mode, seed in [("none", 0), ("com", 1), ("rot", 2), ("sc", 3)]:
        rng = np.random.RandomState(seed)
        img_d, _, label, cube_o, com_o, M_o, rot = augment_crop(
            norm, gt3d_crop, cam.to_img(com3d), cube, M, [mode], hd,
            rng=rng)
        assert img_d.shape == (128, 128)
        assert np.isfinite(img_d).all()
        assert img_d.max() <= 1.0 + 1e-5 and img_d.min() >= -1.0 - 1e-5
        assert np.isfinite(label).all()
        # labels stay roughly inside the normalized cube
        assert np.abs(label).max() < 2.0


def test_sample_random_poses_vectorized_matches_loop_semantics():
    """Vectorized sampler must reproduce per-mode arithmetic."""
    cam = Camera.nyu()
    imp = DepthImporter(cam)
    rng = np.random.RandomState(23455)
    base_poses = np.random.RandomState(1).randn(5, 36, 3).astype(
        np.float32) * 40
    base_com = np.tile(np.array([10, 20, 800], np.float32), (5, 1))
    base_cube = np.tile(np.array([300, 300, 300], np.float32), (5, 1))

    out = HandDetector.sample_random_poses(
        imp, rng, base_poses, base_com, base_cube, 200, np.inf,
        ["none", "com", "rot"])
    assert out.shape == (200, 36, 3)
    assert np.isfinite(out).all()

    # draws must follow the reference order: replicate them and check the
    # 'none' and 'com' subsets analytically
    rng2 = np.random.RandomState(23455)
    modes = rng2.randint(0, 3, 200)
    ridxs = rng2.randint(0, 5, 200)
    off = rng2.randn(200, 3) * 10.0
    none_idx = np.nonzero(modes == 0)[0]
    for i in none_idx[:5]:
        expect = base_poses[ridxs[i]] / 150.0
        np.testing.assert_allclose(out[i], expect, rtol=1e-5)
    com_idx = np.nonzero(modes == 1)[0]
    for i in com_idx[:5]:
        expect = (base_poses[ridxs[i]] - off[i]) / 150.0
        np.testing.assert_allclose(out[i], expect, rtol=1e-4, atol=1e-4)


def test_synthetic_importer_and_dataset():
    spec = {"seed": 23455, "root": "", "subset": "train", "docom": False,
            "augment": True, "sample_poses": 100, "joint_subset": "NYU",
            "n_frames": 4, "n_joints": 36}
    ds = get_dataset({**spec, "class_name": "dataset_hand_synth"})
    assert len(ds) == 4
    item = ds[0]
    assert len(item) == 6  # NYU 6-tuple contract
    img, pose, com, M, cube, cube2 = item
    assert img.shape == (1, 128, 128)
    assert pose.shape == (108,)
    assert np.isfinite(img).all() and np.isfinite(pose).all()

    # pose-only + sampling path
    ds.pose_only = True
    ds.sample_poses()
    assert len(ds) == 100
    assert ds[0].shape == (108,)

    # nmax capping
    ds.set_nmax(0.5)
    assert len(ds) == 50


def test_dataloader_batching_and_prefetch():
    spec = {"seed": 23455, "root": "", "subset": "train", "docom": False,
            "augment": False, "sample_poses": 0, "joint_subset": "NYU",
            "n_frames": 6, "n_joints": 36,
            "class_name": "dataset_hand_synth"}
    ds = get_dataset(spec)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=3)
    batches = list(loader)
    assert len(batches) == 2
    imgs, poses = batches[0][0], batches[0][1]
    assert imgs.shape == (4, 1, 128, 128)
    assert poses.shape == (4, 108)
    assert batches[1][0].shape[0] == 2  # short tail batch kept


def test_detector_detect_on_synthetic():
    cam, dpt, joints3d, com3d = _synthetic_frame()
    hd = HandDetector(dpt, cam.fx, cam.fy)
    com, cube = hd.detect(size=(300, 300, 300), do_hand_size=True)
    # detect() finds the closest blob; z should be near the hand depth
    assert com[2] > 0
    assert abs(com[2] - com3d[2]) < 120
