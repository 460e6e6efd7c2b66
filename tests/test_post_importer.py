"""POSTImporter (reference importers.py:1386-1853, GUI-free port).

Synthetic fixtures written to tmp_path reproduce the dataset layout the
reference expects (basepath contains ``dmaps``; label maps mirror it
under ``lmaps``): per-part label maps for synth frames, HSV color masks
for real frames.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lsps_tpu.data.importers import POSTImporter  # noqa: E402

W, H = 640, 480


def _write_synth(base, n=2):
    ddir = os.path.join(base, "dmaps", "synth0")
    ldir = os.path.join(base, "lmaps", "synth0")
    os.makedirs(ddir), os.makedirs(ldir)
    for i in range(n):
        dpt = np.full((H, W), 10000, np.uint16)  # invalid marker
        lbl = np.zeros((H, W), np.uint16)
        # 18 part blobs in a grid around the image center, ~2m depth
        for j, pid in enumerate(POSTImporter.LBL_IDS):
            r0 = 140 + (j // 6) * 60
            c0 = 200 + (j % 6) * 40
            dpt[r0:r0 + 30, c0:c0 + 30] = 2000 + 10 * j + i
            lbl[r0:r0 + 30, c0:c0 + 30] = pid
        cv2.imwrite(os.path.join(ddir, f"img_d_{i:04d}.png"), dpt)
        cv2.imwrite(os.path.join(ldir, f"img_l_{i:04d}.png"), lbl)
    return os.path.join(base, "dmaps")


def _write_real(base):
    ddir = os.path.join(base, "dmaps", "test0")
    ldir = os.path.join(base, "lmaps", "test0")
    os.makedirs(ddir), os.makedirs(ldir)
    dpt = np.zeros((H, W), np.uint16)
    # subject blob ABOVE the optical center so floor removal keeps it
    dpt[100:200, 280:360] = 2000 * 5  # loadDepthMap divides by 5
    hsv = np.zeros((H, W, 3), np.uint8)
    hsv[100:200, 280:360] = (172, 200, 200)  # in the [169..189] hue gate
    bgr = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    cv2.imwrite(os.path.join(ddir, "img_0000.png"), dpt)
    cv2.imwrite(os.path.join(ldir, "img_0000.png"), bgr)
    return os.path.join(base, "dmaps")


def test_post_synth_sequence(tmp_path):
    basepath = _write_synth(str(tmp_path))
    di = POSTImporter(basepath, use_cache=False)
    arrays = di.load_sequence("synth")
    assert len(arrays) == 2
    assert arrays.gtorig.shape == (2, 18, 3)
    assert arrays.dpt.shape == (2, 128, 128)
    assert tuple(arrays.config["cube"]) == (2000, 2000, 2000)
    # part CoMs sit inside the painted grid with the painted depths
    g = arrays.gtorig[0]
    assert np.all(g[:, 0] >= 200) and np.all(g[:, 0] <= 440)
    assert np.all(g[:, 1] >= 140) and np.all(g[:, 1] <= 330)
    assert np.all(g[:, 2] >= 1990) and np.all(g[:, 2] <= 2190)
    # gt3Dcrop is CoM-centred metric pose
    assert np.isfinite(arrays.gt3Dcrop).all()
    assert np.abs(arrays.gt3Dcrop[0]).max() < 2000
    # crop is normalized around ~2m: foreground present
    assert np.isfinite(arrays.dpt).all()


def test_post_synth_cache_roundtrip(tmp_path):
    basepath = _write_synth(str(tmp_path))
    cache = str(tmp_path / "cache")
    di = POSTImporter(basepath, use_cache=True, cache_dir=cache)
    a1 = di.load_sequence("synth")
    assert any(f.endswith(".npz") for f in os.listdir(cache))
    a2 = POSTImporter(basepath, use_cache=True,
                      cache_dir=cache).load_sequence("synth")
    np.testing.assert_array_equal(a1.dpt, a2.dpt)
    np.testing.assert_array_equal(a1.gt3Dcrop, a2.gt3Dcrop)


def test_post_real_sequence(tmp_path):
    basepath = _write_real(str(tmp_path))
    di = POSTImporter(basepath, use_cache=False)
    arrays = di.load_sequence("test")
    assert len(arrays) == 1
    # real frames carry a single CoM "pose"
    assert arrays.gtorig.shape == (1, 1, 3)
    com = arrays.gtorig[0, 0]
    assert 280 <= com[0] <= 360 and 100 <= com[1] <= 200
    assert com[2] == pytest.approx(2000, rel=0.01)


def test_post_point_cloud_shape():
    di = POSTImporter("/nonexistent", use_cache=False)
    depth = np.zeros((10, 12), np.float32)
    depth[2:5, 3:6] = 100.0
    pc = di.point_cloud(depth)
    assert pc.shape == (10, 12, 3)
    assert np.isnan(pc[0, 0, 2])  # invalid depth -> NaN z
    assert pc[3, 4, 2] == pytest.approx(100.0 / 256.0)


def test_post_skeleton_tables():
    from lsps_tpu.utils.skeleton import POST_BONES, POST_COLOR_IDX, tables_for

    assert len(POST_COLOR_IDX) == 18
    assert len(POST_BONES) == 2 * 2 + 2 * 3
    ci, bones = tables_for("npost.yaml")
    assert ci is POST_COLOR_IDX and bones is POST_BONES
