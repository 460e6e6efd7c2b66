"""Importer file-format tests with synthesized on-disk datasets.

Exercises the real decode paths: NYU (G<<8)|B PNG bit-packing +
joint_data.mat, ICVL single-channel PNG + label txt + horizontal flip,
MSRA .bin bbox format, and the npz caching layer.
"""

import os

import numpy as np
import pytest

from lsps_tpu.data.camera import Camera
from lsps_tpu.data.importers import (ICVLImporter, MSRA15Importer,
                                     NYUImporter)
from lsps_tpu.data.synthetic import render_hand_depth


def _write_nyu_png(path, dpt):
    from PIL import Image

    d = dpt.astype(np.int32)
    r = np.zeros_like(d, np.uint8)
    g = (d >> 8).astype(np.uint8)
    b = (d & 0xFF).astype(np.uint8)
    Image.fromarray(np.stack([r, g, b], -1), "RGB").save(path)


def _write_icvl_png(path, dpt):
    from PIL import Image

    Image.fromarray(dpt.astype(np.int32), "I").save(path)


@pytest.fixture
def nyu_root(tmp_path):
    import scipy.io

    cam = Camera.nyu()
    gen = np.random.RandomState(11)
    root = tmp_path / "nyu"
    (root / "train").mkdir(parents=True)
    n, J = 3, 36
    uvd = np.zeros((1, n, J, 3))
    xyz = np.zeros((1, n, J, 3))
    for i in range(n):
        com3d = np.array([0, 0, 750.0], np.float32)
        dpt, joints3d = render_hand_depth(cam, com3d, J, gen)
        _write_nyu_png(root / "train" / f"depth_1_{i + 1:07d}.png", dpt)
        _write_nyu_png(root / "train" / f"synthdepth_1_{i + 1:07d}.png",
                       dpt)
        uv = cam.to_img(joints3d)
        uvd[0, i] = uv
        # NYU mat stores metric xyz with its own y convention (flip_y)
        xyz[0, i] = cam.img_to_3d(uv)
    scipy.io.savemat(root / "train" / "joint_data.mat",
                     {"joint_xyz": [xyz[0]], "joint_uvd": [uvd[0]]})
    return str(root)


def test_nyu_importer_loads_and_caches(nyu_root, tmp_path):
    cache = str(tmp_path / "cache")
    imp = NYUImporter(nyu_root, cache_dir=cache, all_joints=True,
                      com_idx=32)
    seq = imp.load_sequence("train")
    assert len(seq) == 3
    assert seq.dpt.shape == (3, 128, 128)
    assert seq.gt3Dorig.shape == (3, 36, 3)
    # crops contain hand depth near the com
    assert (np.abs(seq.dpt[0][seq.dpt[0] > 0] - seq.com[0][2]) < 160).any()
    # gt3Dcrop centered at com
    assert np.abs(seq.gt3Dcrop).max() < 200

    # synth subset shares the train dir with a prefix
    seq_s = imp.load_sequence("train_synth")
    assert len(seq_s) == 3

    # cache hit round-trips identically
    files = os.listdir(cache)
    assert any(f.endswith(".npz") for f in files)
    imp2 = NYUImporter(nyu_root, cache_dir=cache, all_joints=True,
                       com_idx=32)
    seq2 = imp2.load_sequence("train")
    np.testing.assert_array_equal(seq2.dpt, seq.dpt)
    np.testing.assert_array_equal(seq2.gt3Dcrop, seq.gt3Dcrop)


def test_nyu_png_bitpacking_roundtrip(tmp_path):
    imp = NYUImporter(str(tmp_path))
    dpt = np.random.RandomState(0).randint(0, 4000, (16, 16)).astype(
        np.float32)
    _write_nyu_png(tmp_path / "d.png", dpt)
    back = imp.load_depth_map(str(tmp_path / "d.png"))
    np.testing.assert_array_equal(back, dpt)


def test_icvl_importer_flip_and_labels(tmp_path):
    cam = Camera.icvl()
    gen = np.random.RandomState(12)
    root = tmp_path / "icvl"
    (root / "Depth").mkdir(parents=True)
    n, J = 2, 16
    lines = []
    for i in range(n):
        com3d = np.array([0, 0, 400.0], np.float32)
        dpt, joints3d = render_hand_depth(cam, com3d, J, gen)
        fname = f"img{i}.png"
        _write_icvl_png(root / "Depth" / fname, dpt)
        uv = cam.to_img(joints3d)
        lines.append(fname + " " + " ".join(
            f"{v:.3f}" for v in uv.reshape(-1)))
    (root / "train.txt").write_text("\n".join(lines) + "\n")

    imp = ICVLImporter(str(root), use_cache=False)
    seq = imp.load_sequence("train")
    assert len(seq) == 2
    assert seq.dpt.shape == (2, 128, 128)
    # horizontal flip applied (importers.py:381-383): u0 -> W - u0
    raw = imp.load_depth_map(str(root / "Depth" / "img0.png"))
    # the stored gtorig should be flipped relative to what we wrote
    orig_u = float(lines[0].split(" ")[1])
    assert seq.gtorig[0, 0, 0] == pytest.approx(320.0 - orig_u, abs=1e-2)


def test_msra_bin_roundtrip(tmp_path):
    import struct

    imp = MSRA15Importer(str(tmp_path))
    h, w = 240, 320
    top, bottom, left, right = 50, 90, 100, 160
    patch = np.random.RandomState(1).uniform(
        300, 500, (bottom - top, right - left)).astype(np.float32)
    with open(tmp_path / "000000_depth.bin", "wb") as f:
        f.write(struct.pack("6i", w, h, left, top, right, bottom))
        patch.tofile(f)
    dpt = imp.load_depth_map(str(tmp_path / "000000_depth.bin"))
    assert dpt.shape == (h, w)
    np.testing.assert_array_equal(dpt[top:bottom, left:right], patch)
    assert dpt[0, 0] == 0.0


def test_icvl_baseline_readers(tmp_path):
    imp = ICVLImporter(str(tmp_path), use_cache=False)
    vals = np.arange(16 * 3, dtype=np.float32) + 100
    (tmp_path / "base.txt").write_text(
        " ".join(f"{v}" for v in vals) + "\n\n")
    data = imp.load_baseline(str(tmp_path / "base.txt"))
    assert len(data) == 1
    assert data[0].shape == (16, 3)
    d2 = imp.load_baseline_2d(str(tmp_path / "base.txt"))
    assert d2[0].shape == (16, 2)
    np.testing.assert_allclose(d2[0][0], vals[:2])
