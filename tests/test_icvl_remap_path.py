"""The nicvl.yaml training path: NYU synth remapped to the ICVL
skeleton (dataset_hand2.py:282-287) — 16-joint subset, y-flip, 48-d
labels feeding vae.input_dim=48."""

import numpy as np
import pytest

from lsps_tpu.data.datasets import NYU_TO_ICVL, NYU_TO_MSRA
from lsps_tpu.data.loader import get_dataset

import lsps_tpu.data.synthetic  # noqa: F401

SPEC = {"seed": 23455, "root": "", "subset": "train", "docom": False,
        "augment": False, "sample_poses": 100, "joint_subset": "NYU",
        "n_frames": 4, "n_joints": 36, "class_name": "dataset_hand_synth"}


def _as_icvl(ds):
    """Apply the ICVL remap the way dataset_hand_NYU does for
    joint_subset='ICVL' (dataset_hand2.py:282-287)."""
    ds.joint_subset = NYU_TO_ICVL
    ds.flip_y = True
    return ds


def test_icvl_subset_maps_and_flips():
    ds_full = get_dataset(SPEC)
    ds_icvl = _as_icvl(get_dataset(SPEC))

    full = ds_full[0]
    icvl = ds_icvl[0]
    pose_full = full[1].reshape(-1, 3)
    pose_icvl = icvl[1].reshape(-1, 3)
    assert pose_icvl.shape == (16, 3)  # 48-d flat -> vae.input_dim=48
    # subset selection + y flip
    np.testing.assert_allclose(pose_icvl[:, 0],
                               pose_full[NYU_TO_ICVL][:, 0], rtol=1e-6)
    np.testing.assert_allclose(pose_icvl[:, 1],
                               -pose_full[NYU_TO_ICVL][:, 1], rtol=1e-6)
    np.testing.assert_allclose(pose_icvl[:, 2],
                               pose_full[NYU_TO_ICVL][:, 2], rtol=1e-6)


def test_icvl_subset_pose_only_sampling():
    ds = _as_icvl(get_dataset(SPEC))
    ds.pose_only = True
    ds.sample_poses()
    p = ds[0]
    assert p.shape == (48,)
    assert np.isfinite(p).all()


def test_msra_subset_shape():
    ds = get_dataset(SPEC)
    ds.joint_subset = NYU_TO_MSRA
    pose = ds[0][1].reshape(-1, 3)
    assert pose.shape == (21, 3)


def test_augmented_icvl_subset():
    spec = dict(SPEC, augment=True)
    ds = _as_icvl(get_dataset(spec))
    img, pose, com, M, cube, _ = ds[1]
    assert pose.shape == (48,)
    assert img.shape == (1, 128, 128)
    assert np.isfinite(pose).all()
