"""Shared test helpers (deduplicated from the CLI/trainer test files).

Keep the produced hyperparameter dicts BIT-IDENTICAL to the historical
per-file copies: the persistent XLA compilation cache is keyed on the
traced program, so changing a channel count or cadence here forces
minutes-long recompiles of every CLI test on this 1-core host.
"""

import json
import os

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_trainer(map_output_ch=None, **over):
    """ch=4 trainer over 12-d poses — small enough that every update
    rule compiles in seconds on the CPU backend."""
    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.train import LSPSTrainer

    hyp = default_hyperparameters(reg_dim=12, small=True)
    hyp["vae"]["input_dim"] = 12
    hyp["dis"]["reg_dim"] = 12
    hyp["dis"]["ch"] = 4
    hyp["gen"]["ch"] = 4
    if map_output_ch is not None:
        hyp["map"]["output_ch"] = map_output_ch
    hyp.update(over)
    return LSPSTrainer(hyp)


def make_synth_cfg(tmp, tag, *, ch=4, n_frames=8, sample_poses=200,
                   display=1, snapshot_iters=1000, image_iters=1000,
                   image_display_iters=2):
    """Tiny-channel copy of exps/synth.yaml with its own snapshot
    prefix (so runs don't see each other's checkpoints).  Returns the
    written config path."""
    with open(os.path.join(REPO, "exps", "synth.yaml")) as f:
        doc = yaml.safe_load(f)
    train = doc["train"]
    train["snapshot_prefix"] = str(tmp / tag / "pre")
    train["display"] = display
    train["snapshot_save_iterations"] = snapshot_iters
    train["image_save_iterations"] = image_iters
    train["image_display_iterations"] = image_display_iters
    hyp = train["hyperparameters"]
    hyp["gen"]["ch"] = ch
    hyp["dis"]["ch"] = ch
    for ds in train["datasets"].values():
        ds["sample_poses"] = sample_poses
        ds["n_frames"] = n_frames
    cfg_path = tmp / f"{tag}.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(doc, f)
    return str(cfg_path)


def read_metrics(logdir, cfg_path):
    """The metrics.jsonl rows a CLI run wrote for the given config."""
    name = os.path.splitext(os.path.basename(cfg_path))[0]
    with open(os.path.join(logdir, name, "metrics.jsonl")) as f:
        return [json.loads(line) for line in f.read().splitlines()]
