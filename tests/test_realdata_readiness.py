"""Real-data readiness: the *full* config->dataset->loader->eval chain
over on-disk mini-datasets at real camera shapes.

tests/test_importers_fileformats.py pins the decode formats; these tests
go the rest of the way: DatasetSpec dicts shaped like exps/nnyu.yaml /
nicvl.yaml drive `get_dataset` -> registry dataset -> DataLoader batches
-> eval-style denormalization, exactly the path a real NYU/ICVL download
would take (see docs/REALDATA.md for the swap-in recipe).
"""

import numpy as np
import pytest

from lsps_tpu.data.camera import Camera
from lsps_tpu.data.loader import DataLoader, get_dataset
from lsps_tpu.data.synthetic import render_hand_depth

import lsps_tpu.data.datasets  # noqa: F401 (registration)


def _write_nyu_png(path, dpt):
    from PIL import Image

    d = dpt.astype(np.int32)
    arr = np.stack([np.zeros_like(d, np.uint8),
                    (d >> 8).astype(np.uint8),
                    (d & 0xFF).astype(np.uint8)], -1)
    Image.fromarray(arr, "RGB").save(path)


@pytest.fixture(scope="module")
def nyu_root(tmp_path_factory):
    """3 train + 3 synth + 3 test frames at the real 640x480 Kinect
    shape, labels in joint_data.mat exactly like the download."""
    import scipy.io

    cam = Camera.nyu()
    gen = np.random.RandomState(7)
    root = tmp_path_factory.mktemp("nyu")
    for sub in ("train", "test"):
        (root / sub).mkdir(exist_ok=True)
        n, J = 3, 36
        uvd = np.zeros((1, n, J, 3))
        xyz = np.zeros((1, n, J, 3))
        for i in range(n):
            com3d = np.array([0, 0, 750.0 + 30 * i], np.float32)
            dpt, joints3d = render_hand_depth(cam, com3d, J, gen)
            assert dpt.shape == (480, 640)  # real shape, full path
            _write_nyu_png(root / sub / f"depth_1_{i + 1:07d}.png", dpt)
            if sub == "train":
                _write_nyu_png(root / sub / f"synthdepth_1_{i + 1:07d}.png",
                               dpt)
            uv = cam.to_img(joints3d)
            uvd[0, i] = uv
            xyz[0, i] = cam.img_to_3d(uv)
        scipy.io.savemat(root / sub / "joint_data.mat",
                         {"joint_xyz": [xyz[0]], "joint_uvd": [uvd[0]]})
    return str(root)


@pytest.fixture(scope="module")
def icvl_root(tmp_path_factory):
    """3-frame ICVL mini-dataset at the real 320x240 shape."""
    from PIL import Image

    cam = Camera.icvl()
    gen = np.random.RandomState(8)
    root = tmp_path_factory.mktemp("icvl")
    (root / "Depth" / "sequence0").mkdir(parents=True)
    for name in ("train", "test_seq_1", "test_seq_2"):
        lines = []
        for i in range(3):
            com3d = np.array([0, 0, 400.0 + 20 * i], np.float32)
            dpt, joints3d = render_hand_depth(cam, com3d, 16, gen)
            assert dpt.shape == (240, 320)  # real ICVL shape, full path
            fname = f"sequence0/{name}_{i}.png"  # dir name >6 chars = "original" (sub_seq '0')
            Image.fromarray(dpt.astype(np.int32), "I").save(
                root / "Depth" / fname)
            uv = cam.to_img(joints3d)
            lines.append(fname + " " + " ".join(
                f"{v:.3f}" for v in uv.reshape(-1)))
        (root / f"{name}.txt").write_text("\n".join(lines) + "\n")
    return str(root)


def _spec(root, class_name, subset, **extra):
    """DatasetSpec dict in the exps/nnyu.yaml / nicvl.yaml shape."""
    d = {"seed": 23455, "class_name": class_name, "root": root,
         "subset": subset, "sample_poses": 0, "augment": False,
         "docom": False, "joint_subset": "", "cacheDir": root + "/cache"}
    d.update(extra)
    return d


def test_nyu_config_chain_train_and_test(nyu_root):
    ds = get_dataset(_spec(nyu_root, "dataset_hand_NYU", "train",
                           augment=True, joint_subset="NYU"))
    assert len(ds) == 3
    loader = DataLoader(ds, batch_size=3, shuffle=True, seed=1)
    batch = next(iter(loader))
    imgs, labels, coms, Ms, cubes, cubes2 = batch
    assert imgs.shape == (3, 1, 128, 128)
    assert labels.shape == (3, 108)
    assert np.abs(labels).max() <= 1.2  # normalized by cube/2
    assert imgs.min() >= -1.001 and imgs.max() <= 1.001
    np.testing.assert_array_equal(cubes, cubes2)

    ds_t = get_dataset(_spec(nyu_root, "dataset_hand_NYU_test", "test"))
    imgs, labels, com, M, cube, _ = ds_t[0]
    # eval denorm: pose/(cube/2) * cube/2 + com reproduces metric mm
    pose_mm = labels.reshape(-1, 3) * (cube[0] / 2.0) + com
    gt_mm = ds_t.seq.gt3Dorig[0]
    np.testing.assert_allclose(pose_mm, gt_mm, atol=2e-2)


def test_nyu_icvl_remap_chain(nyu_root):
    """nicvl.yaml trains NYU synth with the ICVL 16-joint remap +
    y-flip (the 350 mm cube override applies to synth subsets,
    dataset_hand2.py:286-291)."""
    ds = get_dataset(_spec(nyu_root, "dataset_hand_NYU", "train_synth",
                           joint_subset="ICVL"))
    img, labels, com, M, cube, _ = ds[0]
    assert labels.shape == (48,)
    assert cube[0] == 350.0  # ICVL-remap synth cube


def test_icvl_config_chain(icvl_root):
    ds = get_dataset(_spec(icvl_root, "dataset_hand_ICVL", "train",
                           augment=True))
    assert len(ds) == 3
    loader = DataLoader(ds, batch_size=3, shuffle=False)
    imgs, labels, coms, Ms, cubes = next(iter(loader))
    assert imgs.shape == (3, 1, 128, 128)
    assert labels.shape == (3, 48)

    ds_t = get_dataset(_spec(icvl_root, "dataset_hand_ICVL_test",
                             "test_seq_1"))
    assert len(ds_t) == 6  # both test sequences concatenated
    img, labels, com, M, cube = ds_t[0]
    assert img.shape == (1, 128, 128)


def test_frac_capping_on_disk(nyu_root):
    ds = get_dataset(_spec(nyu_root, "dataset_hand_NYU", "train"))
    ds.set_nmax(2 / 3)
    assert len(ds) == 2
