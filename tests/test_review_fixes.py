"""Regression tests for the round-1 code-review findings."""

import os
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.data.loader import DataLoader, get_dataset, get_data_loader
from lsps_tpu.train import LSPSTrainer

import lsps_tpu.data.synthetic  # noqa: F401

SPEC = {"seed": 23455, "root": "", "subset": "train", "docom": False,
        "augment": True, "sample_poses": 0, "joint_subset": "NYU",
        "n_frames": 6, "n_joints": 36, "class_name": "dataset_hand_synth"}


def _small_hyp():
    hyp = default_hyperparameters(reg_dim=12, small=True)
    hyp["vae"]["input_dim"] = 12
    hyp["dis"]["reg_dim"] = 12
    hyp["dis"]["ch"] = 4
    hyp["gen"]["ch"] = 4
    hyp["map"]["output_ch"] = 16
    return hyp


def test_abandoned_loader_iterators_do_not_leak_threads():
    ds = get_dataset(SPEC)
    before = threading.active_count()
    for _ in range(20):
        it = iter(DataLoader(ds, batch_size=2, shuffle=True, prefetch=1))
        next(it)      # consume one batch, abandon the rest
        it.close()    # what zip()/GC do to a partially-consumed generator
    import time

    time.sleep(1.0)  # let cancelled producers exit
    after = threading.active_count()
    assert after - before <= 2, f"leaked {after - before} threads"


def test_fast_augment_on_test_dataset_is_rejected_not_crash(monkeypatch):
    """Test datasets (augment=False) must decline fast augmentation, not
    raise AttributeError."""
    spec = dict(SPEC, augment=False)
    ds = get_dataset(spec)
    loader = DataLoader(ds, batch_size=2, shuffle=False, fast=True)
    assert loader.fast is False  # declined, falls back to per-sample
    batch = next(iter(loader))
    assert batch[0].shape == (2, 1, 128, 128)


def test_unknown_lsps_augment_value_raises(monkeypatch):
    monkeypatch.setenv("LSPS_AUGMENT", "device")
    ds = get_dataset(SPEC)
    with pytest.raises(ValueError, match="LSPS_AUGMENT"):
        get_data_loader(ds, 2, shuffle=False)


def test_resume_without_opt_files_continues_lr_schedule(tmp_path):
    tr = LSPSTrainer(_small_hyp())
    state = tr.init_state(jax.random.PRNGKey(0))
    prefix = str(tmp_path / "pre")
    # save weights only (no optimizer files)
    tr.ckpt.save(state, prefix, 249999, save_opt=False)

    st2, iters = tr.resume(tr.init_state(jax.random.PRNGKey(1)), prefix,
                           load_opt=True)
    assert iters == 250000
    # scale_by_schedule count seeded -> next dis/gen update uses the
    # decayed LR (epoch 250 > milestone 200)
    assert int(st2["opt"]["dis"][2].count) == 250000
    assert int(st2["opt"]["gen"][2].count) == 250000
    # Adam moments stay fresh (reference recreates Adam on resume)
    assert int(st2["opt"]["dis"][1].count) == 0


def test_synthetic_hash_is_process_stable():
    """zlib.crc32-based seeding: same (seed, subset) -> same data."""
    from lsps_tpu.data.synthetic import SyntheticImporter

    a = SyntheticImporter(n_frames=2, n_joints=14, seed=3).load_sequence(
        "train")
    b = SyntheticImporter(n_frames=2, n_joints=14, seed=3).load_sequence(
        "train")
    np.testing.assert_array_equal(a.dpt, b.dpt)
    np.testing.assert_array_equal(a.gt3Dorig, b.gt3Dorig)


def test_fast_augment_sc_mode_label_scaling():
    """'sc' labels must be normalized by the SCALED cube
    (dataset_hand2.py:91-93)."""
    from lsps_tpu.data.fast_augment import FastAugmenter

    ds_ref = get_dataset(SPEC)
    ds_fast = get_dataset(SPEC)
    ds_ref.aug_modes = ["sc"]
    ds_fast.aug_modes = ["sc"]
    idxs = list(range(len(ds_ref)))
    ref = [ds_ref[i] for i in idxs]
    fa = FastAugmenter(ds_fast)
    imgs, labels, coms, Ms, cubes = fa.batch(idxs)
    ref_labels = np.stack([r[1] for r in ref])
    ref_cubes = np.stack([r[4] for r in ref])
    np.testing.assert_allclose(cubes, ref_cubes, rtol=1e-5)
    np.testing.assert_allclose(labels, ref_labels, rtol=1e-4, atol=1e-4)
