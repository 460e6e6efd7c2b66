"""--snapshot-prefix: one YAML drives several runs without config
copies that differ only in the output directory (cli/common.py
load_experiment)."""

import os

from helpers import make_synth_cfg

from lsps_tpu.cli import common as C


def test_load_experiment_applies_override(tmp_path):
    cfg = make_synth_cfg(tmp_path, "prefix_ovr")
    parser = C.base_parser("t")
    opts = parser.parse_args(["--config", cfg, "--snapshot-prefix",
                              str(tmp_path / "elsewhere" / "pre")])
    config = C.load_experiment(opts)
    assert config.snapshot_prefix == str(tmp_path / "elsewhere" / "pre")

    opts_default = parser.parse_args(["--config", cfg])
    config_default = C.load_experiment(opts_default)
    assert config_default.snapshot_prefix != config.snapshot_prefix


def test_cli_writes_snapshots_at_override(tmp_path, monkeypatch):
    """pose_train with --snapshot-prefix saves the VAE checkpoint under
    the override path, not the YAML's."""
    from lsps_tpu.cli import pose_train

    # pose_train saves the VAE every 4 * snapshot_save_iterations
    # (reference pose_train.py cadence), so cadence 1 -> save at iter 4
    cfg = make_synth_cfg(tmp_path, "prefix_cli", snapshot_iters=1)
    out = tmp_path / "ovr"
    pose_train.main(["--config", cfg, "--frac", "0.5",
                     "--max-iterations", "4", "--batch-size", "4",
                     "--steps-per-call", "1",
                     "--log", str(tmp_path / "logs"),
                     "--snapshot-prefix", str(out / "pre")])
    saved = [f for f in os.listdir(out) if f.startswith("pre_vae_")]
    assert saved, f"no VAE snapshot under override dir: {os.listdir(out)}"
