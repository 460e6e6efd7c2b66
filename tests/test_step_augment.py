"""Fused-in-step augmentation (LSPS_AUGMENT=step): the image half of
augmentCrop (reference dataset_hand2.py:34-119) runs INSIDE the jitted
training program; the host supplies warp params only.  Round-2 verdict
item #2 — close the jitted-vs-wall step-time gap by keeping every
iteration a single XLA dispatch including augmentation.
"""

import os

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from helpers import make_synth_cfg as _make_cfg
from helpers import read_metrics as _metrics
from helpers import tiny_trainer as _tiny_trainer


def _raw_batch(b=4, seed=0):
    """Synthetic warp-param batch: identity-ish transforms over random
    mm crops."""
    rs = np.random.RandomState(seed)
    src = (750.0 + 100.0 * rs.rand(b, 128, 128)).astype(np.float32)
    src[:, :8] = 0.0  # some background
    minv = np.tile(np.eye(3), (b, 1, 1))
    minv[:, 0, 2] = rs.randn(b) * 2.0  # small translations
    com_z = np.full(b, 780.0, np.float32)
    cube_z = np.full(b, 300.0, np.float32)
    premax = com_z + cube_z / 2
    zstart = com_z - cube_z / 2
    zend = com_z + cube_z / 2
    return (src, minv, com_z, cube_z, premax, zstart, zend)


def test_device_augment_lowers_gather_free():
    """The on-device warp must stay gather-free: XLA lowered the
    elementwise ``s[iy, ix]`` gather to a 5.4 ms/domain scalar-loop
    fusion inside the full-size training program (docs/BENCHMARKS.md
    round-3), so the warp is two one-hot contractions instead.  Guard
    against a refactor quietly reintroducing a gather."""
    from lsps_tpu.data.augment_jax import device_recrop_normalize_batch

    raw = _raw_batch(2)
    txt = jax.jit(device_recrop_normalize_batch).lower(*raw).as_text()
    assert "gather" not in txt, "augment warp reintroduced a gather"
    assert "dot_general" in txt  # the one-hot contractions


def test_pretrain_update_raw_equals_augment_then_update():
    """pretrain_update_raw(raw, ...) == pretrain_update(augment(raw), ...)
    — same math, one program."""
    from lsps_tpu.data.augment_jax import device_recrop_normalize_batch

    trainer = _tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0))
    raw_a, raw_b = _raw_batch(4, 0), _raw_batch(4, 1)
    la = np.random.RandomState(2).randn(4, 12).astype(np.float32) * 0.1
    lb = np.random.RandomState(3).randn(4, 12).astype(np.float32) * 0.1
    rng = jax.random.PRNGKey(7)

    imgs_a = np.asarray(device_recrop_normalize_batch(*raw_a))[..., None]
    imgs_b = np.asarray(device_recrop_normalize_batch(*raw_b))[..., None]
    s_ref, m_ref, _ = trainer.pretrain_update(
        state, jnp.asarray(imgs_a), jnp.asarray(la), jnp.asarray(imgs_b),
        jnp.asarray(lb), rng)
    s_raw, m_raw, (outs, ia, ib) = trainer.pretrain_update_raw(
        state, raw_a, la, raw_b, lb, rng)

    np.testing.assert_allclose(np.asarray(ia), imgs_a, rtol=1e-6, atol=1e-6)
    for k in ("dis_loss", "gen_total_loss", "gen_ll_loss"):
        np.testing.assert_allclose(float(m_raw[k]), float(m_ref[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    ref_leaves = jax.tree_util.tree_leaves(s_ref["params"])
    raw_leaves = jax.tree_util.tree_leaves(s_raw["params"])
    for a, b in zip(ref_leaves, raw_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_post_update_raw_mode3():
    trainer = _tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0))
    raw_a, raw_b = _raw_batch(4, 0), _raw_batch(4, 1)
    la = np.random.RandomState(2).randn(4, 12).astype(np.float32) * 0.1
    lb = np.random.RandomState(3).randn(4, 12).astype(np.float32) * 0.1
    state, met, (outs, ia, ib) = trainer.post_update_raw(
        state, raw_a, la, raw_b, lb, jax.random.PRNGKey(5), mode=3)
    assert np.isfinite(float(met["dis_total_loss"]))
    assert ia.shape == (4, 128, 128, 1)


def test_dataset_raw_fast_batch_contract():
    """raw_fast_batch returns the warp-param 7-tuple + the same labels
    the kernel path produces."""
    from lsps_tpu.data.loader import get_dataset

    specs = {"seed": 3, "class_name": "dataset_hand_synth", "root": "",
             "subset": "train", "joint_subset": "NYU", "sample_poses": 0,
             "augment": True, "docom": False, "n_frames": 6,
             "n_joints": 36}
    import lsps_tpu.data.synthetic  # noqa: F401 (registration)

    ds = get_dataset(specs)
    assert ds.enable_fast_augment("step")
    raw, labels, coms, Ms, cubes = ds.raw_fast_batch([0, 1, 2])
    assert len(raw) == 7
    src, minv = raw[0], raw[1]
    assert src.shape == (3, 128, 128) and minv.shape == (3, 3, 3)
    assert labels.shape == (3, 108)
    # the same RNG draws through the kernel path give the same labels
    ds2 = get_dataset(specs)
    assert ds2.enable_fast_augment("jax")
    imgs2, labels2, coms2, _, cubes2 = ds2.fast_batch([0, 1, 2])[:5]
    np.testing.assert_allclose(labels, labels2, rtol=0, atol=0)
    np.testing.assert_allclose(coms, coms2, rtol=0, atol=0)
    # and the in-step augment of raw == the jax-backend images
    from lsps_tpu.data.augment_jax import device_recrop_normalize_batch

    imgs = np.asarray(device_recrop_normalize_batch(*raw))
    np.testing.assert_allclose(imgs, imgs2[:, 0], rtol=1e-6, atol=1e-6)


def test_loader_disable_raw_falls_back_to_images():
    """disable_raw(): the loader leaves 'step' raw yields and serves
    augmented IMAGE batches (jax backend) — used when the peer loader
    cannot supply raw warp params."""
    from lsps_tpu.data.loader import DataLoader, get_dataset

    specs = {"seed": 5, "class_name": "dataset_hand_synth", "root": "",
             "subset": "train", "joint_subset": "NYU", "sample_poses": 0,
             "augment": True, "docom": False, "n_frames": 6,
             "n_joints": 36}
    import lsps_tpu.data.synthetic  # noqa: F401 (registration)

    dl = DataLoader(get_dataset(specs), 3, shuffle=False,
                    fast=True, fast_backend="step")
    assert dl.raw
    dl.disable_raw()
    assert not dl.raw and dl.fast
    batch = next(iter(dl))
    assert batch[0].shape == (3, 1, 128, 128)  # images, not a 7-tuple


def test_cli_step_backend_matches_jax_backend(tmp_path, monkeypatch):
    """depth_train with LSPS_AUGMENT=step reproduces the LSPS_AUGMENT=jax
    trajectory (identical augment math, now inside the train program)."""
    from lsps_tpu.cli import depth_train

    runs = {}
    for backend in ("jax", "step"):
        monkeypatch.setenv("LSPS_AUGMENT", backend)
        cfg = _make_cfg(tmp_path, backend)
        log = str(tmp_path / f"logs_{backend}")
        depth_train.main(["--config", cfg, "--mode", "pretrain",
                          "--log", log, "--max-iterations", "3",
                          "--batch-size", "4"])
        runs[backend] = _metrics(log, cfg)
        # image cadence ran with the in-step images
        assert os.path.isfile(str(tmp_path / backend / "images" /
                                  "gen.jpg"))

    assert len(runs["jax"]) == len(runs["step"]) == 3
    for rj, rs in zip(runs["jax"], runs["step"]):
        for k in ("dis_loss", "gen_total_loss"):
            np.testing.assert_allclose(rs[k], rj[k], rtol=1e-4,
                                       atol=1e-5, err_msg=k)


def test_cli_step_backend_mixed_augment_flags(tmp_path, monkeypatch):
    """LSPS_AUGMENT=step with asymmetric augment flags: train_b has
    augment off, so its loader yields images while train_a's would
    yield raw warp-param 7-tuples.  The CLI must demote the raw loader
    to image yields (the step functions consume two of the SAME kind)
    instead of feeding a ragged tuple into the image path."""
    from lsps_tpu.cli import depth_train

    monkeypatch.setenv("LSPS_AUGMENT", "step")
    cfg = _make_cfg(tmp_path, "mixed")
    with open(cfg) as f:
        doc = yaml.safe_load(f)
    doc["train"]["datasets"]["train_b"]["augment"] = False
    with open(cfg, "w") as f:
        yaml.safe_dump(doc, f)
    log = str(tmp_path / "logs_mixed")
    depth_train.main(["--config", cfg, "--mode", "pretrain",
                      "--log", log, "--max-iterations", "2",
                      "--batch-size", "4"])
    mets = _metrics(log, cfg)
    assert len(mets) == 2
    assert all(np.isfinite(m["dis_loss"]) for m in mets)
