"""Tests for the live-frame utilities and legacy stack builders."""

import numpy as np
import pytest

from lsps_tpu.data.camera import Camera
from lsps_tpu.data.stacks import SequenceDataset, img_stack_depth_only
from lsps_tpu.data.synthetic import SyntheticImporter, render_hand_depth
from lsps_tpu.utils.realtime import CAMERAS, Frame, SKEL_NORM_RATIO


def test_frame_from_depth_crop_and_reprojection():
    cam, far = CAMERAS["kinect"]
    gen = np.random.RandomState(3)
    com3d = np.array([0.0, 0.0, 700.0], np.float32)
    dm, joints = render_hand_depth(cam, com3d, 14, gen)
    f = Frame.from_depth(dm, cam, far, com2d=cam.to_img(com3d),
                         skel=joints.reshape(-1), cube=(300, 300, 300))
    assert f.crop_dm.shape == (128, 128)
    assert f.crop_dm.min() >= -0.5 - 1e-5
    assert f.crop_dm.max() <= 0.5 + 1e-5
    # skeleton normalize/denormalize roundtrip
    back = f.denormalize_skel(f.norm_skel)
    np.testing.assert_allclose(back, joints.reshape(-1), atol=1e-3)
    # crop2d of the com lands near the crop center
    crop2d = f.skel_to_crop2d(com3d[None].repeat(2, 0))
    assert np.all(np.abs(crop2d - 64.0) < 4)
    # full2d of the com lands at its image position
    full2d = f.skel_to_full2d(com3d[None].repeat(2, 0))
    np.testing.assert_allclose(full2d[0], cam.to_img(com3d)[:2], atol=1e-3)


def test_frame_auto_com_detection():
    cam, far = CAMERAS["kinect"]
    gen = np.random.RandomState(4)
    com3d = np.array([30.0, -20.0, 800.0], np.float32)
    dm, _ = render_hand_depth(cam, com3d, 14, gen)
    f = Frame.from_depth(dm, cam, far)  # no com given -> detector CoM
    assert abs(f.com3d[2] - com3d[2]) < 100


def test_img_stack_depth_only():
    imp = SyntheticImporter(n_frames=3, n_joints=14, seed=5)
    arrays = imp.load_sequence("train")
    imgs, labels = img_stack_depth_only(arrays)
    assert imgs.shape == (3, 1, 128, 128)
    assert labels.shape == (3, 14, 3)
    assert imgs.min() >= -1.0 - 1e-5 and imgs.max() <= 1.0 + 1e-5
    assert np.abs(labels).max() < 2.0
    ds = SequenceDataset(arrays)
    assert len(ds) == 3
    i2, l2 = ds.imgStackDepthOnly()
    np.testing.assert_array_equal(i2, imgs)


def test_render_with_prediction():
    cam, far = CAMERAS["kinect"]
    gen = np.random.RandomState(6)
    com3d = np.array([0.0, 0.0, 750.0], np.float32)
    dm, joints = render_hand_depth(cam, com3d, 14, gen)
    f = Frame.from_depth(dm, cam, far, com2d=cam.to_img(com3d),
                         skel=joints.reshape(-1), cube=(300, 300, 300))
    img = f.render(pred_norm_skel=f.norm_skel)
    assert img.shape == (128, 128, 3)
    assert img.dtype == np.uint8
