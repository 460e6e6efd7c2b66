"""Preemption-safe resume through the CLI: run with --orbax-dir, then
resume and confirm the full state (params + optimizer + step) restores."""

import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_depth_train_orbax_resume(tmp_path, capsys):
    with open(os.path.join(REPO, "exps", "synth.yaml")) as f:
        doc = yaml.safe_load(f)
    train = doc["train"]
    train["snapshot_prefix"] = str(tmp_path / "out" / "pre")
    train["snapshot_save_iterations"] = 3
    train["image_save_iterations"] = 100
    train["image_display_iterations"] = 100
    train["display"] = 100
    for ds in train["datasets"].values():
        ds["n_frames"] = 6
        ds["sample_poses"] = 0
    cfg = tmp_path / "cfg.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(doc, f)

    from lsps_tpu.cli import depth_train

    orbax_dir = str(tmp_path / "orbax")
    depth_train.main(["--config", str(cfg), "--mode", "pretrain",
                      "--max-iterations", "4", "--batch-size", "2",
                      "--log", str(tmp_path / "logs"),
                      "--orbax-dir", orbax_dir])
    # step 3 saved (snapshot at (it+1)%3==0 -> it=2 -> step 3)
    assert any(d.startswith("state_") for d in os.listdir(orbax_dir))

    depth_train.main(["--config", str(cfg), "--mode", "pretrain",
                      "--resume", "1",
                      "--max-iterations", "5", "--batch-size", "2",
                      "--log", str(tmp_path / "logs"),
                      "--orbax-dir", orbax_dir])
    out = capsys.readouterr().out
    assert "Resumed full state from orbax step" in out
