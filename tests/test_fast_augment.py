"""FastAugmenter must agree with the per-sample augment_crop path for
the same RandomState (pixel agreement up to NN-rounding ties; labels
exact)."""

import numpy as np
import pytest

from lsps_tpu.data.fast_augment import FastAugmenter, available
from lsps_tpu.data.loader import get_dataset

import lsps_tpu.data.synthetic  # noqa: F401

SPEC = {"seed": 23455, "root": "", "subset": "train", "docom": False,
        "augment": True, "sample_poses": 0, "joint_subset": "NYU",
        "n_frames": 6, "n_joints": 36, "class_name": "dataset_hand_synth"}


def _reference_batch(ds, idxs):
    outs = [ds[i] for i in idxs]
    return tuple(np.stack([o[j] for o in outs]) for j in range(5))


def test_fast_augment_matches_per_sample():
    ds_ref = get_dataset(SPEC)
    ds_fast = get_dataset(SPEC)  # fresh copy with identical rng state
    idxs = list(range(len(ds_ref)))

    imgs_r, lbl_r, com_r, M_r, cube_r = _reference_batch(ds_ref, idxs)
    fa = FastAugmenter(ds_fast)
    imgs_f, lbl_f, com_f, M_f, cube_f = fa.batch(idxs)

    assert imgs_f.shape == imgs_r.shape
    np.testing.assert_allclose(lbl_f, lbl_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(com_f, com_r, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(cube_f, cube_r, rtol=1e-5)
    np.testing.assert_allclose(M_f, M_r, rtol=1e-4, atol=1e-3)
    # NN warps may differ on exact rounding ties at object borders
    agree = np.mean(np.abs(imgs_f - imgs_r) < 1e-3)
    assert agree > 0.97, f"only {agree:.2%} pixels agree"
    assert imgs_f.min() >= -1 - 1e-5 and imgs_f.max() <= 1 + 1e-5


def test_jax_backend_matches_native():
    """The device-side augmentation program must agree with the native
    C++ kernel (same math; only NN-rounding ties may differ)."""
    ds_a = get_dataset(SPEC)
    ds_b = get_dataset(SPEC)
    idxs = list(range(len(ds_a)))
    fa_native = FastAugmenter(ds_a, backend="native")
    fa_jax = FastAugmenter(ds_b, backend="jax")
    out_n = fa_native.batch(idxs)
    out_j = fa_jax.batch(idxs)
    np.testing.assert_allclose(out_j[1], out_n[1], rtol=1e-4, atol=1e-4)
    agree = np.mean(np.abs(out_j[0] - out_n[0]) < 1e-3)
    assert agree > 0.99, f"only {agree:.2%} pixels agree"


def test_backend_divergence_is_sparse_boundary_flips():
    """Character of the native-vs-jax disagreement (the decoherence
    seed in the fused-step accuracy A/B, docs/BENCHMARKS.md): with
    IDENTICAL warp params the two kernels may pick different source
    pixels where f64-vs-f32 ``floor(x+0.5)`` straddles a tie — so the
    differing pixels must be RARE (a systematic numeric drift would
    touch every pixel) and, when they occur at the hand/background
    edge, large.  A regression that introduced real numeric drift
    (e.g. a lost f64 path in the native kernel or f32 coords upstream)
    would blow the sparsity bound."""
    spec = dict(SPEC, n_frames=48)
    ds = get_dataset(spec)
    fa = FastAugmenter(ds, backend="native")
    idxs = list(range(len(ds)))
    raw = fa.raw_batch(idxs)[0]

    from lsps_tpu import native
    from lsps_tpu.data.augment_jax import device_recrop_normalize_batch
    from lsps_tpu.data.fast_augment import NV_VAL, PAD_VALUE

    imgs_n = native.fused_recrop_normalize_batch(
        *raw, pad_value=PAD_VALUE, nv_val=NV_VAL)
    imgs_j = np.asarray(device_recrop_normalize_batch(
        *raw, pad_value=PAD_VALUE, nv_val=NV_VAL))

    d = imgs_n - imgs_j
    nz = d != 0
    assert nz.mean() < 1e-3, (
        f"{nz.mean():.2%} pixels differ — rounding ties are ~1e-5; "
        "this looks like numeric drift between the backends")
    if nz.any():
        # tie flips select a different source pixel; at the object
        # border that is a near-full-range jump, not a small epsilon
        assert np.median(np.abs(d[nz])) > 0.1, (
            "differing pixels have small deltas — systematic drift, "
            "not NN tie flips")


def test_loader_fast_path_tuple_contract():
    from lsps_tpu.data.loader import DataLoader

    ds = get_dataset(SPEC)
    loader = DataLoader(ds, batch_size=3, shuffle=False, fast=True)
    assert loader.fast, "native fast path failed to enable"
    batch = next(iter(loader))
    assert len(batch) == 6  # NYU 6-tuple contract incl. duplicate cube
    imgs, labels, coms, Ms, cubes, cubes2 = batch
    assert imgs.shape == (3, 1, 128, 128)
    assert labels.shape == (3, 108)
    np.testing.assert_array_equal(cubes, cubes2)
    assert np.isfinite(imgs).all()


def test_fast_augment_throughput_sanity():
    """The batched path must not be slower than per-sample (smoke)."""
    import time

    ds = get_dataset(SPEC)
    fa = FastAugmenter(ds)
    idxs = list(range(len(ds))) * 4
    t0 = time.perf_counter()
    fa.batch(idxs)
    dt_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in idxs:
        ds[i]
    dt_ref = time.perf_counter() - t0
    # no strict assertion on a noisy 1-core box; just record both ran
    assert dt_fast > 0 and dt_ref > 0
