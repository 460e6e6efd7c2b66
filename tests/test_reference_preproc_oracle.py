"""Parity vs the reference's OWN preprocessing code (the L2 oracle).

``tests/ref_preproc_oracle.py`` loads the actual
``/root/reference/src`` ``handdetector.py`` / ``dataset_hand2.py`` /
``importers.py`` / ``transformations.py`` under this Python 3 with py2
semantics preserved (division, dtype promotion, scipy/cv2 API eras).
These tests drive the genuine reference code and our rebuild on
identical inputs:

* ``cropArea3D`` (plain, alternate cube/dsize, ``docom``) — BIT-exact;
* ``normalize`` + ``augmentCrop`` in all four modes — bit-exact except
  the documented f64-geometry deltas (below);
* the ND-aware ``bilinearResize`` — bit-exact, incl. random ND masks;
* ``calculateCoM`` — bit-exact;
* ``sampleRandomPoses`` — the vectorized rebuild consumes the same
  RandomState stream as the reference's 250k-iteration Python loop;
* ``loadDepthMap`` for the NYU G<<8|B PNG, ICVL single-channel PNG and
  MSRA bbox-header ``.bin`` file formats — bit-exact;
* camera projections (NYU/ICVL intrinsics).

Documented deviation (the ONLY one): our host geometry
(``Camera.joint_img_to_3d`` etc.) computes and RETURNS f64 where the
reference stores each component to f32 (importers.py:84-123).  Paths
through ``move_com``/``rotate_hand`` therefore differ by the f32
storage rounding — bounded here at ≤2e-5 mm on CoM and ≤3e-7 on
normalized depth/labels, 4+ orders below the ±0.5 mm parity gate.
Everything else asserts ``array_equal``.
"""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from ref_preproc_oracle import load_ref_preproc, reference_available  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def ref():
    return load_ref_preproc()


@pytest.fixture(scope="module")
def ref_imp(ref):
    return ref["importers"].NYUImporter("")


@pytest.fixture(scope="module")
def ours():
    """Our side of every comparison — the golden generator's build()."""
    sys.path.insert(0, GOLDEN_DIR)
    try:
        import gen_golden_preproc as gen
    finally:
        sys.path.pop(0)
    return gen.build()


def _synth_depth():
    sys.path.insert(0, GOLDEN_DIR)
    try:
        import gen_golden_preproc as gen
    finally:
        sys.path.pop(0)
    return gen.synth_depth()


@pytest.fixture(scope="module")
def ref_det(ref, ref_imp):
    return ref["handdetector"].HandDetector(_synth_depth(), 588.03, 587.07,
                                            importer=ref_imp)


COM = np.array([160.0, 120.0, 800.0])


# ---------------------------------------------------------------------------
# projections
# ---------------------------------------------------------------------------

def test_projection_matches_reference_importer(ref_imp):
    from lsps_tpu.data.camera import Camera

    cam = Camera.nyu()
    rs = np.random.RandomState(0)
    uvd = np.stack([rs.uniform(0, 640, 64), rs.uniform(0, 480, 64),
                    rs.uniform(500, 1500, 64)], -1)
    for p in uvd:
        np.testing.assert_allclose(cam.joint_img_to_3d(p),
                                   ref_imp.jointImgTo3D(p).astype(np.float64),
                                   rtol=0, atol=1e-3)
        np.testing.assert_allclose(
            cam.joint_3d_to_img(cam.joint_img_to_3d(p)), p, atol=1e-9)
    # batch forms agree with the reference's loops
    np.testing.assert_allclose(
        np.stack([cam.joint_3d_to_img(cam.joint_img_to_3d(p)) for p in uvd]),
        ref_imp.jointsImgTo3D(ref_imp.joints3DToImg(uvd)).astype(np.float64),
        rtol=0, atol=1e-3)


def test_icvl_projection_matches(ref):
    from lsps_tpu.data.camera import Camera

    imp = ref["importers"].ICVLImporter("")
    cam = Camera.icvl()
    p = np.array([100.0, 90.0, 450.0])
    np.testing.assert_allclose(cam.joint_img_to_3d(p),
                               imp.jointImgTo3D(p).astype(np.float64),
                               rtol=0, atol=1e-3)


# ---------------------------------------------------------------------------
# cropArea3D — bit-exact
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tag,size,dsize", [
    ("a", (250, 250, 250), (128, 128)),
    ("b", (300, 300, 300), (128, 128)),
    ("c", (250, 250, 250), (64, 64)),
])
def test_crop_area_3d_bit_exact_vs_reference(ref_det, ours, tag, size,
                                             dsize):
    ret, M, com = ref_det.cropArea3D(com=COM.copy(), size=size, dsize=dsize)
    np.testing.assert_array_equal(ret, ours[f"crop_{tag}"])
    np.testing.assert_array_equal(M, ours[f"M_{tag}"])
    np.testing.assert_array_equal(com, ours[f"com_{tag}"])


def test_crop_area_3d_docom_bit_exact_vs_reference(ref_det, ours):
    ret, M, com = ref_det.cropArea3D(com=COM.copy(), size=(250, 250, 250),
                                     dsize=(128, 128), docom=True)
    np.testing.assert_array_equal(ret, ours["crop_docom"])
    np.testing.assert_array_equal(M, ours["M_docom"])
    np.testing.assert_array_equal(com, ours["com_docom"])


def test_calculate_com_bit_exact_vs_reference(ref_det):
    from lsps_tpu.data.detector import HandDetector

    dpt = _synth_depth()
    our_det = HandDetector(dpt.copy(), 588.03, 587.07)
    np.testing.assert_array_equal(our_det.calculate_com(dpt),
                                  ref_det.calculateCoM(dpt))


# ---------------------------------------------------------------------------
# normalize + augmentCrop
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_norm(ref, ref_det):
    base_crop, base_m, base_com = ref_det.cropArea3D(
        com=COM.copy(), size=(250, 250, 250), dsize=(128, 128))
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    norm = ref["dataset_hand2"].normalize(base_crop.copy(), base_com, cube)
    return norm, base_m, base_com, cube


def test_normalize_bit_exact_vs_reference(ref_norm, ours):
    np.testing.assert_array_equal(ref_norm[0], ours["norm"])


@pytest.mark.parametrize("mode", ["none", "com", "rot", "sc"])
def test_augment_crop_vs_reference(ref, ref_det, ref_norm, ours, mode):
    norm, base_m, base_com, cube = ref_norm
    rs = np.random.RandomState(11)
    gt3d = (rs.rand(36, 3).astype(np.float32) - 0.5) * 200.0
    rng = np.random.RandomState(23455 + len(mode))
    img_d, _, label, cube_o, com_o, m_o, rot = ref["dataset_hand2"].augmentCrop(
        norm.copy(), gt3d, base_com.astype(np.float32), cube.copy(),
        base_m.astype(np.float32), [mode], ref_det, rng=rng)
    np.testing.assert_array_equal(np.asarray(cube_o),
                                  ours[f"aug_{mode}_cube"])
    np.testing.assert_array_equal(m_o, ours[f"aug_{mode}_M"])
    np.testing.assert_array_equal(np.float64(rot), ours[f"aug_{mode}_rot"])
    if mode in ("none", "sc"):  # no projections involved -> bit-exact
        np.testing.assert_array_equal(img_d, ours[f"aug_{mode}_img"])
        np.testing.assert_array_equal(label, ours[f"aug_{mode}_label"])
        np.testing.assert_array_equal(com_o, ours[f"aug_{mode}_com"])
    else:  # f32-storage rounding of the reference's projections
        np.testing.assert_allclose(img_d, ours[f"aug_{mode}_img"],
                                   rtol=0, atol=3e-7)
        np.testing.assert_allclose(label, ours[f"aug_{mode}_label"],
                                   rtol=0, atol=3e-7)
        np.testing.assert_allclose(com_o, ours[f"aug_{mode}_com"],
                                   rtol=0, atol=2e-5)


# ---------------------------------------------------------------------------
# ND-aware bilinear resize — bit-exact
# ---------------------------------------------------------------------------

def test_bilinear_resize_bit_exact_vs_reference(ref, ours, ref_det):
    dpt = _synth_depth()
    src = dpt[100:160, 130:190].copy()
    src[5:10, 5:10] = ref_det.getNDValue()
    out = ref["handdetector"].HandDetector.bilinearResize(
        src, (41, 37), ref_det.getNDValue())
    np.testing.assert_array_equal(out, ours["bilin_out"])


def test_bilinear_resize_random_nd_bit_exact(ref):
    from lsps_tpu.data.detector import HandDetector

    rs = np.random.RandomState(3)
    src = rs.rand(50, 44).astype(np.float32) * 1000 + 500
    src[rs.rand(50, 44) < 0.15] = 7.0
    ref_out = ref["handdetector"].HandDetector.bilinearResize(
        src, (31, 23), 7.0)
    np.testing.assert_array_equal(
        HandDetector.bilinear_resize(src, (31, 23), 7.0), ref_out)


# ---------------------------------------------------------------------------
# sampleRandomPoses — vectorized rebuild vs the reference loop
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("aug_modes", [
    ["none", "rot", "sc", "com"],
    ["rot+com", "com+rot", "rot+com+sc", "rot+sc+com"],
])
def test_sample_random_poses_vs_reference(ref, ref_imp, aug_modes):
    from lsps_tpu.data.camera import Camera
    from lsps_tpu.data.detector import HandDetector

    rs = np.random.RandomState(7)
    P, J, N = 12, 36, 300
    base_poses = (rs.rand(P, J, 3).astype(np.float32) - 0.5) * 180.0
    base_com = np.stack([rs.uniform(200, 400, P), rs.uniform(150, 300, P),
                         rs.uniform(650, 950, P)], -1).astype(np.float32)
    base_cube = np.tile(np.array([250.0, 250.0, 250.0], np.float32),
                        (P, 1))

    ref_out = ref["handdetector"].HandDetector.sampleRandomPoses(
        ref_imp, np.random.RandomState(23455), base_poses, base_com,
        base_cube, N, P, aug_modes, retall=True)
    our_out = HandDetector.sample_random_poses(
        Camera.nyu(), np.random.RandomState(23455), base_poses, base_com,
        base_cube, N, P, aug_modes, retall=True)

    # poses go through the reference's f32 projections in rot branches;
    # our geometry is f64 (documented) -> tight tolerance there,
    # bit-exact elsewhere
    np.testing.assert_allclose(our_out[0], ref_out[0], rtol=0, atol=2e-6)
    np.testing.assert_array_equal(our_out[1], ref_out[1])
    np.testing.assert_array_equal(our_out[2], ref_out[2])
    np.testing.assert_array_equal(our_out[3], ref_out[3])


# ---------------------------------------------------------------------------
# detect — closest-object sweep end-to-end
# ---------------------------------------------------------------------------

def test_detect_vs_reference(ref, ref_imp):
    from lsps_tpu.data.detector import HandDetector

    # Hand blob on an invalid (0) background: the reference sweep skips
    # the first 5 depth slices, so the hand must not sit at the very
    # front of the frame's depth range (handdetector.py:578-580).
    dpt = _synth_depth()
    dpt[dpt > 1500] = 0.0
    ref_det = ref["handdetector"].HandDetector(dpt.copy(), 588.03, 587.07,
                                               importer=ref_imp)
    our_det = HandDetector(dpt.copy(), 588.03, 587.07)
    ref_com, ref_size = ref_det.detect(size=(250, 250, 250),
                                       doHandSize=True)
    our_com, our_size = our_det.detect(size=(250, 250, 250),
                                       do_hand_size=True)
    np.testing.assert_allclose(our_com, np.asarray(ref_com, np.float64),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(our_size),
                               np.asarray(ref_size), rtol=0, atol=1e-9)


# ---------------------------------------------------------------------------
# loadDepthMap file formats — bit-exact
# ---------------------------------------------------------------------------

def test_nyu_load_depth_map_bit_exact(ref, tmp_path):
    from PIL import Image

    from lsps_tpu.data.importers import NYUImporter

    rs = np.random.RandomState(5)
    depth = rs.randint(0, 3000, (48, 64)).astype(np.uint16)
    rgb = np.zeros((48, 64, 3), np.uint8)
    rgb[..., 1] = (depth >> 8).astype(np.uint8)
    rgb[..., 2] = (depth & 0xFF).astype(np.uint8)
    rgb[..., 0] = rs.randint(0, 255, (48, 64)).astype(np.uint8)
    path = str(tmp_path / "nyu_depth.png")
    Image.fromarray(rgb).save(path)

    ref_img = ref["importers"].NYUImporter("").loadDepthMap(path)
    our_img = NYUImporter("").load_depth_map(path)
    np.testing.assert_array_equal(our_img, ref_img)
    np.testing.assert_array_equal(our_img, depth.astype(np.float32))


def test_icvl_load_depth_map_bit_exact(ref, tmp_path):
    from PIL import Image

    from lsps_tpu.data.importers import ICVLImporter

    rs = np.random.RandomState(6)
    depth = rs.randint(0, 255, (40, 56)).astype(np.uint8)
    path = str(tmp_path / "icvl_depth.png")
    Image.fromarray(depth, mode="L").save(path)

    ref_img = ref["importers"].ICVLImporter("").loadDepthMap(path)
    our_img = ICVLImporter("").load_depth_map(path)
    np.testing.assert_array_equal(our_img, ref_img)


def test_msra_load_depth_map_bit_exact(ref, tmp_path):
    from lsps_tpu.data.importers import MSRA15Importer

    rs = np.random.RandomState(8)
    width, height = 320, 240
    left, top, right, bottom = 90, 60, 180, 150
    patch = rs.uniform(300, 900, (bottom - top,
                                  right - left)).astype(np.float32)
    path = str(tmp_path / "000000_depth.bin")
    with open(path, "wb") as f:
        f.write(struct.pack("6i", width, height, left, top, right, bottom))
        patch.tofile(f)

    ref_img = ref["importers"].MSRA15Importer("").loadDepthMap(path)
    our_img = MSRA15Importer("").load_depth_map(path)
    np.testing.assert_array_equal(our_img, ref_img)
