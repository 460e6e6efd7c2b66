"""uint16 raw-crop cache (half-size npz / host RSS / H2D stream).

With the default NN resize every crop pixel is integral sensor mm, 0,
the nd pad, or the single per-frame zstart clamp value
(handdetector.py:293-297 semantics; reference importers.py:987-1004 —
depth is integral mm at the sensor), so ``basetypes.encode_dpt_u16``
can code a sequence losslessly and everything downstream must be
BIT-IDENTICAL to the float32 path: decode helpers, the cache roundtrip,
both augment backends, and the fused-in-step training path (the device
program decodes the uint16 codes in-program)."""

import os

import numpy as np
import pytest

from lsps_tpu.data.basetypes import (FrameArrays, decode_dpt_u16,
                                     encode_dpt_u16)
from lsps_tpu.data.camera import Camera
from lsps_tpu.data.fast_augment import NV_VAL, PAD_VALUE, FastAugmenter
from lsps_tpu.data.importers import DepthImporter
from lsps_tpu.data.loader import get_dataset

import lsps_tpu.data.synthetic  # noqa: F401

SPEC = {"seed": 977, "root": "", "subset": "train", "docom": False,
        "augment": True, "sample_poses": 0, "joint_subset": "NYU",
        "n_frames": 6, "n_joints": 36, "class_name": "dataset_hand_synth"}


def _integral_crops(n=4, h=32, w=32, seed=3):
    """Crop-shaped data with the exact value classes crop_area_3d
    produces under NN resize: integral mm foreground, 0 background,
    integral nd pad, ONE fractional zstart clamp value per frame."""
    rs = np.random.RandomState(seed)
    dpt = np.zeros((n, h, w), np.float32)
    vstar = np.empty(n, np.float32)
    for i in range(n):
        dpt[i, 4:-4, 4:-4] = rs.randint(600, 1000,
                                        (h - 8, w - 8)).astype(np.float32)
        dpt[i, :2] = 32001.0  # nd pad ring (integral)
        vstar[i] = np.float32(rs.uniform(590.0, 610.0))  # zstart clamp
        dpt[i, 10:12, 10:14] = vstar[i]
    return dpt, vstar


def test_encode_decode_bitexact_roundtrip():
    dpt, vstar = _integral_crops()
    enc = encode_dpt_u16(dpt)
    assert enc is not None
    codes, v = enc
    assert codes.dtype == np.uint16
    np.testing.assert_array_equal(v, vstar)
    np.testing.assert_array_equal(decode_dpt_u16(codes, v), dpt)
    # per-frame slice decode too
    np.testing.assert_array_equal(decode_dpt_u16(codes[2], v[2]), dpt[2])


@pytest.mark.parametrize("poison", ["bilinear", "negative", "big",
                                    "two_frac", "one_mm"])
def test_encode_falls_back_when_lossy(poison):
    dpt, _ = _integral_crops()
    if poison == "bilinear":  # fractional everywhere (bilinear resize)
        dpt = dpt + np.float32(0.25)
    elif poison == "negative":
        dpt[0, 5, 5] = -3.0
    elif poison == "big":
        dpt[0, 5, 5] = 70000.0
    elif poison == "two_frac":  # two distinct fractional values
        dpt[0, 5, 5] = 601.5
        dpt[0, 6, 6] = 602.5
    elif poison == "one_mm":  # genuine 1-mm pixel collides with code 1
        dpt[0, 5, 5] = 1.0
    assert encode_dpt_u16(dpt) is None


def _arrays(dpt, vstar=None, cube=(300, 300, 300)):
    n = dpt.shape[0]
    z = np.zeros((n, 3, 3), np.float32)
    return FrameArrays(
        name="t", dpt=dpt, gtorig=np.zeros((n, 2, 3), np.float32),
        gtcrop=np.zeros((n, 2, 3), np.float32), M=z,
        gt3Dorig=np.zeros((n, 2, 3), np.float32),
        gt3Dcrop=np.zeros((n, 2, 3), np.float32),
        com=np.zeros((n, 3), np.float32), config={"cube": cube},
        file_names=[f"f{i}" for i in range(n)], dpt_vstar=vstar)


def test_cache_roundtrip_u16(tmp_path, monkeypatch):
    dpt, _ = _integral_crops()
    imp = DepthImporter(Camera.nyu(), use_cache=True,
                        cache_dir=str(tmp_path))
    path = str(tmp_path / "seq.npz")
    imp._save_cache(path, _arrays(dpt))
    with np.load(path, allow_pickle=True) as z:
        assert "dpt_u16" in z and "dpt" not in z.files
    loaded = imp._load_cached(path, False, None, np.inf)
    assert loaded.dpt.dtype == np.uint16  # stays half-size resident
    np.testing.assert_array_equal(loaded.dpt_mm(), dpt)
    np.testing.assert_array_equal(loaded.dpt_mm([1, 3]), dpt[[1, 3]])
    assert loaded.take([0, 2]).dpt_vstar is not None
    # frame() materializes decoded mm
    np.testing.assert_array_equal(loaded.frame(1).dpt, dpt[1])
    # opt-out decodes at load
    monkeypatch.setenv("LSPS_CACHE_F32", "1")
    f32 = imp._load_cached(path, False, None, np.inf)
    assert f32.dpt.dtype == np.float32 and f32.dpt_vstar is None
    np.testing.assert_array_equal(f32.dpt, dpt)


def test_cache_roundtrip_fallback_f32(tmp_path):
    dpt, _ = _integral_crops()
    dpt += np.float32(0.25)  # not losslessly codable
    imp = DepthImporter(Camera.nyu(), use_cache=True,
                        cache_dir=str(tmp_path))
    path = str(tmp_path / "seq.npz")
    imp._save_cache(path, _arrays(dpt))
    with np.load(path, allow_pickle=True) as z:
        assert "dpt" in z.files and "dpt_u16" not in z.files
    loaded = imp._load_cached(path, False, None, np.inf)
    assert loaded.dpt.dtype == np.float32
    np.testing.assert_array_equal(loaded.dpt, dpt)


def _u16_pair():
    """Two identical synthetic datasets; one reholds its sequence in
    uint16-coded form (depth snapped to integral mm first so the coding
    is lossless — the synthetic renderer emits fractional z)."""
    ds_f32 = get_dataset(SPEC)
    ds_u16 = get_dataset(SPEC)
    dpt = np.round(ds_f32.seq.dpt).astype(np.float32)
    rs = np.random.RandomState(5)
    vs = rs.uniform(590.0, 610.0, len(ds_f32)).astype(np.float32)
    dpt[:, 60:62, 60:64] = vs[:, None, None]  # per-frame zstart clamp
    import dataclasses

    ds_f32.seq = dataclasses.replace(ds_f32.seq, dpt=dpt)
    codes, vstar = encode_dpt_u16(dpt)
    ds_u16.seq = dataclasses.replace(ds_u16.seq, dpt=codes,
                                     dpt_vstar=vstar)
    return ds_f32, ds_u16


@pytest.mark.parametrize("backend", ["jax", "native"])
def test_fast_augment_u16_bitexact(backend):
    ds_f32, ds_u16 = _u16_pair()
    out_f = FastAugmenter(ds_f32, backend=backend).batch(
        list(range(len(ds_f32))))
    out_u = FastAugmenter(ds_u16, backend=backend).batch(
        list(range(len(ds_u16))))
    for a, b in zip(out_f, out_u):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_raw_tuple_and_device_decode_bitexact():
    """raw_batch grows the vstar element for uint16 sequences and the
    fused device program's in-program decode matches the f32 path
    bitwise (same program downstream of the decode)."""
    from lsps_tpu.data.augment_jax import device_recrop_normalize_batch

    ds_f32, ds_u16 = _u16_pair()
    idxs = list(range(len(ds_f32)))
    raw_f = FastAugmenter(ds_f32).raw_batch(idxs)[0]
    raw_u = FastAugmenter(ds_u16).raw_batch(idxs)[0]
    assert len(raw_f) == 7 and len(raw_u) == 8
    assert raw_u[0].dtype == np.uint16
    np.testing.assert_array_equal(
        decode_dpt_u16(raw_u[0], raw_u[7]), raw_f[0])
    img_f = np.asarray(device_recrop_normalize_batch(
        *raw_f, pad_value=PAD_VALUE, nv_val=NV_VAL))
    img_u = np.asarray(device_recrop_normalize_batch(
        *raw_u, pad_value=PAD_VALUE, nv_val=NV_VAL))
    np.testing.assert_array_equal(img_f, img_u)


def test_trainer_raw_step_u16_matches_f32():
    """pretrain_update_raw consumes the 8-tuple unchanged (in-step
    fused augment) and reproduces the f32-tuple step metrics."""
    import jax

    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.train import LSPSTrainer

    ds_f32, ds_u16 = _u16_pair()
    idxs = list(range(4))
    raw_f, lbl, _, _, _ = FastAugmenter(ds_f32).raw_batch(idxs)
    raw_u = FastAugmenter(ds_u16).raw_batch(idxs)[0]

    hyp = default_hyperparameters(reg_dim=lbl.shape[1], small=True)
    hyp["vae"]["input_dim"] = lbl.shape[1]
    hyp["dis"]["reg_dim"] = lbl.shape[1]
    hyp["dis"]["ch"] = 4
    hyp["gen"]["ch"] = 4
    trainer = LSPSTrainer(hyp)
    state0 = trainer.init_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    lblj = lbl.astype(np.float32)
    _, met_f, _ = trainer.pretrain_update_raw(
        state0, raw_f, lblj, raw_f, lblj, rng)
    _, met_u, _ = trainer.pretrain_update_raw(
        state0, raw_u, lblj, raw_u, lblj, rng)
    for k in met_f:
        np.testing.assert_array_equal(np.asarray(met_f[k]),
                                      np.asarray(met_u[k]), err_msg=k)
