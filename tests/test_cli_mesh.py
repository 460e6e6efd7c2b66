"""Data-parallel training through the ACTUAL CLIs on the 8-device CPU
mesh (--mesh-data): the loop being scaled is the reference's
depth_train.py:140-166 / pose_train.py:121-190 over SURVEY §2.8's data
axis.  Round-2 verdict item #1: the mesh path must be reachable from
``python -m lsps_tpu.cli.depth_train``, not just from trainer-level
tests, and must produce the same metrics as single-device training.
"""

import os

import numpy as np
import pytest

from helpers import make_synth_cfg, read_metrics


def _make_cfg(tmp, tag, ch=4, n_frames=10):
    return make_synth_cfg(tmp, tag, ch=ch, n_frames=n_frames,
                          snapshot_iters=2, image_iters=2)


_metrics = read_metrics


def test_depth_pretrain_mesh_cli_matches_single(tmp_path):
    """depth_train --mode pretrain --mesh-data 8 through the CLI must
    reproduce the single-device loss trajectory (GSPMD all-reduce ==
    single-device batch gradient)."""
    from lsps_tpu.cli import depth_train

    runs = {}
    for tag, extra in (("single", []), ("mesh", ["--mesh-data", "8"])):
        cfg = _make_cfg(tmp_path, tag)
        log = str(tmp_path / f"logs_{tag}")
        depth_train.main(["--config", cfg, "--mode", "pretrain",
                          "--log", log, "--max-iterations", "3",
                          "--batch-size", "8"] + extra)
        runs[tag] = _metrics(log, cfg)
        # snapshot at iteration 2 verifies saving a mesh-sharded state
        out = os.path.dirname(cfg and str(tmp_path / tag / "pre"))
        files = os.listdir(out)
        assert any(f.startswith("pre_gen_") for f in files), (tag, files)

    assert len(runs["single"]) == len(runs["mesh"]) == 3
    for rs, rm in zip(runs["single"], runs["mesh"]):
        assert rs["step"] == rm["step"]
        for k in ("dis_loss", "gen_total_loss", "gen_ad_loss"):
            np.testing.assert_allclose(
                rm[k], rs[k], rtol=2e-3, atol=1e-4,
                err_msg=f"step {rs['step']} metric {k}")


def test_depth_estimate3_mesh_cli_with_sharded_eval(tmp_path):
    """estimate3 through the CLI on the mesh, including the sharded
    eval gather (test batch padded to a mesh multiple and trimmed)."""
    from lsps_tpu.cli import depth_train

    cfg = _make_cfg(tmp_path, "est", n_frames=10)  # test set 6 frames
    log = str(tmp_path / "logs_est")
    depth_train.main(["--config", cfg, "--mode", "estimate3",
                      "--frac", "0.9", "--idx", "0", "--log", log,
                      "--max-iterations", "2", "--batch-size", "8",
                      "--mesh-data", "8"])
    recs = _metrics(log, cfg)
    assert recs and all(np.isfinite(r["dis_total_loss"]) for r in recs)
    images = str(tmp_path / "est" / "images")
    # eval ran at iteration 2 (image_save_iterations=2) on the mesh
    assert os.path.isfile(os.path.join(images, "gen.avi"))
    assert os.path.isfile(os.path.join(images, "_test.jpg"))


def test_pose_train_mesh_cli_matches_single(tmp_path):
    """pose_train --mesh-data 8: sharded pose batches, replicated VAE."""
    from lsps_tpu.cli import pose_train

    runs = {}
    for tag, extra in (("psingle", []), ("pmesh", ["--mesh-data", "8"])):
        cfg = _make_cfg(tmp_path, tag)
        log = str(tmp_path / f"logs_{tag}")
        pose_train.main(["--config", cfg, "--frac", "0.5", "--log", log,
                         "--max-iterations", "4", "--batch-size", "8"]
                        + extra)
        runs[tag] = _metrics(log, cfg)

    assert len(runs["psingle"]) == len(runs["pmesh"]) == 4
    for rs, rm in zip(runs["psingle"], runs["pmesh"]):
        np.testing.assert_allclose(rm["vae_total_loss"],
                                   rs["vae_total_loss"],
                                   rtol=2e-3, atol=1e-4)


def test_pose_train_mesh_checks_concatenated_batch(tmp_path):
    """With frac > 0 the batch fed to vae_step is concat(labels_a,
    labels_b) = 2*batch rows (reference pose_train.py:125-130), so
    --batch-size 4 --mesh-data 8 is a VALID run (8 rows shard evenly)
    — the divisibility guard must check the concatenated size, not the
    per-loader one."""
    from lsps_tpu.cli import pose_train

    cfg = _make_cfg(tmp_path, "pconcat")
    log = str(tmp_path / "logs_pconcat")
    pose_train.main(["--config", cfg, "--frac", "0.5", "--log", log,
                     "--max-iterations", "2", "--batch-size", "4",
                     "--mesh-data", "8"])
    assert len(_metrics(log, cfg)) == 2


def test_depth_pretrain_mesh_plus_step_augment(tmp_path, monkeypatch):
    """--mesh-data combined with LSPS_AUGMENT=step: warp params shard
    over the data axis and the augment chain runs inside the pjit'd
    program."""
    from lsps_tpu.cli import depth_train

    monkeypatch.setenv("LSPS_AUGMENT", "step")
    cfg = _make_cfg(tmp_path, "meshstep")
    log = str(tmp_path / "logs_meshstep")
    depth_train.main(["--config", cfg, "--mode", "pretrain",
                      "--log", log, "--max-iterations", "2",
                      "--batch-size", "8", "--mesh-data", "8"])
    recs = _metrics(log, cfg)
    assert len(recs) == 2
    assert all(np.isfinite(r["gen_total_loss"]) for r in recs)
    assert all(np.isfinite(r["dis_loss"]) for r in recs)


def test_mesh_indivisible_batch_raises(tmp_path):
    """A global batch the mesh can't split must fail up front with a
    clear error, not a GSPMD layout crash mid-loop."""
    from lsps_tpu.cli import depth_train

    cfg = _make_cfg(tmp_path, "indiv")
    with pytest.raises(ValueError, match="not divisible"):
        depth_train.main(["--config", cfg, "--mode", "pretrain",
                          "--log", str(tmp_path / "logs"),
                          "--max-iterations", "1", "--batch-size", "6",
                          "--mesh-data", "8"])


def test_mesh_runner_validation():
    from lsps_tpu.cli.common import MeshRunner, make_mesh_runner

    class Opts:
        mesh_data = 0

    assert make_mesh_runner(Opts()) is None
    with pytest.raises(ValueError, match="need >= 2"):
        MeshRunner(1)
    with pytest.raises(ValueError, match="exceeds"):
        MeshRunner(99)
    mr = MeshRunner(-1)  # all 8 virtual devices
    assert mr.n_data == 8
    mr.check_batch(8)
    with pytest.raises(ValueError, match="not divisible"):
        mr.check_batch(3)
    (x,), n = mr.place_padded(np.ones((6, 2), np.float32))
    assert n == 6 and x.shape == (8, 2)
