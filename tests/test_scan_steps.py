"""Multi-step scan training (``--steps-per-call K``): K update steps in
ONE XLA program (``lax.scan`` over pre-staged batches), amortizing the
per-dispatch host/H2D overhead that dominates small-step wall time on a
tunneled host (docs/BENCHMARKS.md round-3 wall-gap table).

Equivalence contract: a K-chunk fed the host pre-folded rng chain
(``cli.common.fold_chain``) reproduces K single-step calls — same
``fold_in(key, it)`` chain, same update math (``trainer._scan_chunk``).
Reference loops being batched: depth_train.py:140-166,
pose_train.py:95-141.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from lsps_tpu.cli import common as C

from helpers import make_synth_cfg as _make_cfg
from helpers import read_metrics as _metrics
from helpers import tiny_trainer as _tiny_trainer


def _raw_batch(b=4, seed=0):
    """Synthetic warp-param batch (see test_step_augment._raw_batch)."""
    rs = np.random.RandomState(seed)
    src = (750.0 + 100.0 * rs.rand(b, 128, 128)).astype(np.float32)
    src[:, :8] = 0.0
    minv = np.tile(np.eye(3), (b, 1, 1))
    minv[:, 0, 2] = rs.randn(b) * 2.0
    com_z = np.full(b, 780.0, np.float32)
    cube_z = np.full(b, 300.0, np.float32)
    premax = com_z + cube_z / 2
    zstart = com_z - cube_z / 2
    zend = com_z + cube_z / 2
    return (src, minv, com_z, cube_z, premax, zstart, zend)


def _stack_raw(raws):
    return tuple(np.stack([r[i] for r in raws])
                 for i in range(len(raws[0])))


def _assert_trees_close(a, b, **kw):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64), **kw)


# ---------------------------------------------------------------------
# chunk planning
# ---------------------------------------------------------------------
def test_chunk_len_planning():
    # no cadences: full k
    assert C.chunk_len(0, 8, (), None) == 8
    # cadence boundary = the step whose completion hits c ((b+1)%c==0):
    # with c=100 that is step 99; from it=96 only 96..99 fit (ends ON it)
    assert C.chunk_len(96, 8, (100,), None) == 4
    # immediately after a boundary: full k again
    assert C.chunk_len(100, 8, (100,), None) == 8
    # k | c: every chunk is full (the CLI never leaves the fast path)
    for it in range(0, 200, 4):
        assert C.chunk_len(it, 4, (100,), None) == 4
    # several cadences: the nearest wins
    assert C.chunk_len(8, 8, (10, 100), None) == 2
    # max_iterations caps the tail chunk
    assert C.chunk_len(6, 8, (), 10) == 4
    # never below 1 (a boundary step itself runs as a 1-chunk)
    assert C.chunk_len(99, 8, (100,), None) == 1


def test_fold_chain_matches_single_folds():
    key = np.asarray(jax.random.PRNGKey(3))
    keys, final = C.fold_chain(key, 5, 4)
    assert keys.shape == (4,) + key.shape
    r = key
    for j in range(4):
        r = C.host_fold_in(r, 5 + j)
        np.testing.assert_array_equal(keys[j], np.asarray(r))
    np.testing.assert_array_equal(np.asarray(final), np.asarray(r))


# ---------------------------------------------------------------------
# trainer-level equivalence: K-chunk == K single steps
# ---------------------------------------------------------------------
def test_vae_scan_equivalence():
    trainer = _tiny_trainer()
    labels = (np.random.RandomState(1).randn(6, 8, 12) * 0.3).astype(
        np.float32)
    key0 = np.asarray(jax.random.PRNGKey(42))

    s = trainer.init_state(jax.random.PRNGKey(0))
    r = key0
    singles = []
    for it in range(6):
        r = C.host_fold_in(r, it)
        s, met, _ = trainer.vae_update(s, jnp.asarray(labels[it]), r)
        singles.append({k: float(v) for k, v in met.items()})

    keys, _ = C.fold_chain(key0, 0, 6)
    s2, mets, dec = trainer.vae_scan(
        trainer.init_state(jax.random.PRNGKey(0)), labels, keys)

    for j in range(6):
        for k, want in singles[j].items():
            np.testing.assert_allclose(float(mets[k][j]), want,
                                       rtol=1e-5, atol=1e-7,
                                       err_msg=f"{k}@{j}")
    _assert_trees_close(s["params"], s2["params"], rtol=1e-5, atol=1e-7)
    assert int(s2["step"]) == 6
    # outs carry = the LAST step's decoded batch
    assert dec.shape == (8, 12)


def test_pretrain_scan_equivalence():
    trainer = _tiny_trainer()
    k, b = 3, 2
    rs = np.random.RandomState(7)
    imgs_a = (rs.randn(k, b, 128, 128, 1) * 0.2).astype(np.float32)
    imgs_b = (rs.randn(k, b, 128, 128, 1) * 0.2).astype(np.float32)
    ls_a = (rs.randn(k, b, 12) * 0.1).astype(np.float32)
    ls_b = (rs.randn(k, b, 12) * 0.1).astype(np.float32)
    key0 = np.asarray(jax.random.PRNGKey(9))

    s = trainer.init_state(jax.random.PRNGKey(0))
    r = key0
    singles = []
    for it in range(k):
        r = C.host_fold_in(r, it)
        s, met, outs = trainer.pretrain_update(
            s, jnp.asarray(imgs_a[it]), jnp.asarray(ls_a[it]),
            jnp.asarray(imgs_b[it]), jnp.asarray(ls_b[it]), r)
        singles.append({kk: float(v) for kk, v in met.items()})

    keys, _ = C.fold_chain(key0, 0, k)
    s2, mets, outs2 = trainer.pretrain_scan(
        trainer.init_state(jax.random.PRNGKey(0)), imgs_a, ls_a, imgs_b,
        ls_b, keys, raw=False)

    for j in range(k):
        for kk, want in singles[j].items():
            np.testing.assert_allclose(float(mets[kk][j]), want,
                                       rtol=1e-3, atol=1e-5,
                                       err_msg=f"{kk}@{j}")
    # scan-body vs standalone compilation reassociates conv fusions;
    # Adam amplifies that float-epsilon gradient noise to ~lr scale on
    # near-zero-gradient elements (update ~ m/(sqrt(v)+eps) is sign-like
    # there), so allow sub-lr absolute drift (lr = 1e-4, 3 steps)
    _assert_trees_close(s["params"], s2["params"], rtol=5e-3, atol=2e-4)
    # outs carry matches the single path's last-step outputs
    assert len(outs2) == len(outs) == 8
    np.testing.assert_allclose(np.asarray(outs2[0]), np.asarray(outs[0]),
                               rtol=2e-3, atol=2e-4)


def test_post_scan_raw_equivalence():
    """The fused-augment posterior step under scan: raw 7-tuples stack
    component-wise; the carry returns the last step's augmented
    images."""
    trainer = _tiny_trainer()
    k, b = 2, 4
    raws_a = [_raw_batch(b, 10 + i) for i in range(k)]
    raws_b = [_raw_batch(b, 20 + i) for i in range(k)]
    rs = np.random.RandomState(3)
    ls_a = (rs.randn(k, b, 12) * 0.1).astype(np.float32)
    ls_b = (rs.randn(k, b, 12) * 0.1).astype(np.float32)
    key0 = np.asarray(jax.random.PRNGKey(11))

    s = trainer.init_state(jax.random.PRNGKey(0))
    r = key0
    singles = []
    for it in range(k):
        r = C.host_fold_in(r, it)
        s, met, (outs, ia, ib) = trainer.post_update_raw(
            s, raws_a[it], jnp.asarray(ls_a[it]), raws_b[it],
            jnp.asarray(ls_b[it]), r, mode=3)
        singles.append({kk: float(v) for kk, v in met.items()})

    keys, _ = C.fold_chain(key0, 0, k)
    s2, mets, (outs2, ia2, ib2) = trainer.post_scan(
        trainer.init_state(jax.random.PRNGKey(0)), _stack_raw(raws_a),
        ls_a, _stack_raw(raws_b), ls_b, keys, raw=True, mode=3)

    for j in range(k):
        for kk, want in singles[j].items():
            np.testing.assert_allclose(float(mets[kk][j]), want,
                                       rtol=1e-3, atol=1e-5,
                                       err_msg=f"{kk}@{j}")
    _assert_trees_close(s["params"]["dis"], s2["params"]["dis"],
                        rtol=2e-3, atol=2e-5)
    # carried images = the last step's augmented batch
    np.testing.assert_allclose(np.asarray(ia2), np.asarray(ia),
                               rtol=1e-5, atol=1e-6)


def test_with_viz_false_same_training():
    """``with_viz=False`` (the CLIs' ordinary-step variant — viz panels
    cost ~10 ms/step of output-layout work at full size, see
    trainer._pretrain_update) drops ONLY the third return element:
    params and metrics match the with_viz=True program."""
    trainer = _tiny_trainer()
    b = 2
    rs = np.random.RandomState(5)
    ia = jnp.asarray((rs.randn(b, 128, 128, 1) * .2).astype(np.float32))
    ib = jnp.asarray((rs.randn(b, 128, 128, 1) * .2).astype(np.float32))
    la = jnp.asarray((rs.randn(b, 12) * .1).astype(np.float32))
    lb = jnp.asarray((rs.randn(b, 12) * .1).astype(np.float32))
    r = jax.random.PRNGKey(1)

    s1, m1, outs1 = trainer.pretrain_update(
        trainer.init_state(jax.random.PRNGKey(0)), ia, la, ib, lb, r)
    s2, m2, outs2 = trainer.pretrain_update(
        trainer.init_state(jax.random.PRNGKey(0)), ia, la, ib, lb, r,
        with_viz=False)
    assert outs1 is not None and outs2 is None
    for k in m1:
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    _assert_trees_close(s1["params"], s2["params"], rtol=1e-4, atol=1e-6)

    # raw + scan composition: viz-less chunk returns None outs
    raws_a = [_raw_batch(4, 30), _raw_batch(4, 31)]
    raws_b = [_raw_batch(4, 40), _raw_batch(4, 41)]
    ls = (np.random.RandomState(6).randn(2, 4, 12) * .1).astype(
        np.float32)
    keys, _ = C.fold_chain(np.asarray(jax.random.PRNGKey(2)), 0, 2)
    s3, mets, outs3 = trainer.pretrain_scan(
        trainer.init_state(jax.random.PRNGKey(0)), _stack_raw(raws_a),
        ls, _stack_raw(raws_b), ls, keys, raw=True, with_viz=False)
    assert outs3 is None
    assert np.isfinite(np.asarray(mets["gen_total_loss"])).all()
    assert mets["gen_total_loss"].shape == (2,)  # one entry per step
    # pretrain keeps state["step"] (schedules ride the opt count;
    # only vae_update advances it — trainer.py:248 vs :345)
    assert int(s3["step"]) == 0

    # posterior variant
    s4, m4, o4 = trainer.post_update_raw(
        trainer.init_state(jax.random.PRNGKey(0)), raws_a[0],
        jnp.asarray(ls[0]), raws_b[0], jnp.asarray(ls[0]), r, mode=3,
        with_viz=False)
    assert o4 is None
    assert np.isfinite(float(m4["dis_total_loss"]))


# ---------------------------------------------------------------------
# CLI-level equivalence: --steps-per-call K reproduces the classic loop
# ---------------------------------------------------------------------
def test_cli_depth_steps_per_call_matches_single(tmp_path):
    """depth_train --steps-per-call 2 == --steps-per-call 1, with an
    image cadence landing exactly on a chunk boundary (the outs
    carry)."""
    from lsps_tpu.cli import depth_train

    runs = {}
    for k in (1, 2):
        tag = f"spc{k}"
        cfg = _make_cfg(tmp_path, tag)
        log = str(tmp_path / f"logs_{tag}")
        depth_train.main(["--config", cfg, "--mode", "pretrain",
                          "--log", log, "--max-iterations", "4",
                          "--batch-size", "4", "--steps-per-call",
                          str(k)])
        runs[k] = _metrics(log, cfg)
        # the strip cadence (every 2) fell on chunk boundaries
        assert os.path.isfile(str(tmp_path / tag / "images" / "gen.jpg"))

    assert len(runs[1]) == len(runs[2]) == 4
    for r1, r2 in zip(runs[1], runs[2]):
        assert r1["step"] == r2["step"]
        for key in ("dis_loss", "gen_total_loss", "dis_lr"):
            np.testing.assert_allclose(r2[key], r1[key], rtol=1e-4,
                                       atol=1e-5, err_msg=key)


def test_cli_depth_mesh_plus_steps_per_call(tmp_path):
    """--mesh-data 8 composed with --steps-per-call 2: stacked (K, B)
    batches shard on the batch axis, K steps scan per dispatch, and the
    trajectory matches the single-device single-step loop."""
    from lsps_tpu.cli import depth_train

    runs = {}
    for tag, extra in (("mref", []),
                       ("mscan", ["--mesh-data", "8",
                                  "--steps-per-call", "2"])):
        cfg = _make_cfg(tmp_path, tag)
        log = str(tmp_path / f"logs_{tag}")
        depth_train.main(["--config", cfg, "--mode", "pretrain",
                          "--log", log, "--max-iterations", "4",
                          "--batch-size", "8"] + extra)
        runs[tag] = _metrics(log, cfg)

    assert len(runs["mref"]) == len(runs["mscan"]) == 4
    for r1, r2 in zip(runs["mref"], runs["mscan"]):
        assert r1["step"] == r2["step"]
        for key in ("dis_loss", "gen_total_loss"):
            np.testing.assert_allclose(r2[key], r1[key], rtol=2e-3,
                                       atol=1e-4, err_msg=key)


def test_cli_pose_mesh_plus_steps_per_call(tmp_path):
    """pose_train --mesh-data 8 --steps-per-call 3 == single-device
    single-step (sharded label stacks, replicated VAE)."""
    from lsps_tpu.cli import pose_train

    runs = {}
    for tag, extra in (("pmref", []),
                       ("pmscan", ["--mesh-data", "8",
                                   "--steps-per-call", "3"])):
        cfg = _make_cfg(tmp_path, tag)
        log = str(tmp_path / f"logs_{tag}")
        pose_train.main(["--config", cfg, "--frac", "0.5", "--log", log,
                         "--max-iterations", "6", "--batch-size", "8"]
                        + extra)
        runs[tag] = _metrics(log, cfg)

    assert len(runs["pmref"]) == len(runs["pmscan"]) == 6
    for r1, r2 in zip(runs["pmref"], runs["pmscan"]):
        assert r1["step"] == r2["step"]
        np.testing.assert_allclose(r2["vae_total_loss"],
                                   r1["vae_total_loss"], rtol=2e-3,
                                   atol=1e-4)


def test_cli_pose_steps_per_call_matches_single(tmp_path):
    from lsps_tpu.cli import pose_train

    runs = {}
    for k in (1, 3):
        tag = f"pspc{k}"
        cfg = _make_cfg(tmp_path, tag)
        log = str(tmp_path / f"logs_{tag}")
        pose_train.main(["--config", cfg, "--frac", "0.5", "--log", log,
                         "--max-iterations", "6", "--batch-size", "8",
                         "--steps-per-call", str(k)])
        runs[k] = _metrics(log, cfg)

    assert len(runs[1]) == len(runs[3]) == 6
    for r1, r3 in zip(runs[1], runs[3]):
        assert r1["step"] == r3["step"]
        np.testing.assert_allclose(r3["vae_total_loss"],
                                   r1["vae_total_loss"], rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(r3["vae_lr"], r1["vae_lr"], rtol=0,
                                   atol=0)


def test_resolve_steps_per_call_auto():
    """--steps-per-call defaults to 0 = auto, resolved per CLI from the
    round-3 measurements: pose auto=8 (~2x wall win on the tiny
    dispatch-bound step), depth auto=1 (chunk staging loses)."""
    from types import SimpleNamespace as NS

    assert C.resolve_steps_per_call(NS(steps_per_call=0), auto=8) == 8
    assert C.resolve_steps_per_call(NS(steps_per_call=0), auto=1) == 1
    # explicit values override auto; non-positive clamps to 1
    assert C.resolve_steps_per_call(NS(steps_per_call=3), auto=8) == 3
    assert C.resolve_steps_per_call(NS(steps_per_call=-2), auto=8) == 1
    opts = C.base_parser("x").parse_args(["--config", "c"])
    assert opts.steps_per_call == 0  # parser default is auto
