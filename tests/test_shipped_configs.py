"""The shipped experiment configs must construct the full-size system:
YAML -> NetConfig -> trainer -> parameter trees with the reference's
architecture dimensions."""

import os

import numpy as np
import pytest

import jax

from lsps_tpu.config import NetConfig
from lsps_tpu.registry import lookup

import lsps_tpu.train.trainer  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("name,reg_dim", [("nnyu.yaml", 108),
                                          ("nicvl.yaml", 48)])
def test_shipped_config_constructs_full_system(name, reg_dim):
    cfg = NetConfig(os.path.join(REPO, "exps", name))
    hyp = cfg.hyperparameters
    assert hyp["vae"]["input_dim"] == reg_dim
    assert hyp["dis"]["reg_dim"] == reg_dim
    assert hyp["gen"]["ch"] == 64
    assert hyp["max_iterations"] == 500000
    assert cfg.snapshot_save_iterations == 25000
    assert cfg.display == 10
    for key in ("train_a", "train_b", "test_b"):
        assert key in cfg.datasets
        assert cfg.datasets[key]["seed"] == 23455

    trainer_cls = lookup("trainer", hyp["trainer"])
    trainer = trainer_cls(hyp)
    state = trainer.init_state(jax.random.PRNGKey(0))

    # architecture dimensions (exps/nnyu.yaml:41-60)
    n_params = sum(int(np.prod(np.shape(l)))
                   for l in jax.tree_util.tree_leaves(state["params"]))
    assert n_params > 10_000_000  # full-size system

    # dis trunk reaches ch * 2^(front-1) * 2^shared = 64*2*16 = 2048
    assert trainer.dis.trunk_ch == 2048
    # gen shared latent: ch * 2^(n_enc_front_blk-1) = 256
    assert trainer.gen.latent_ch == 256
    # vae heads
    assert np.shape(state["params"]["vae"]["en_mu"]["w"]) == (50, 20)
    assert np.shape(state["params"]["vae"]["de_fc2"]["w"]) == (50, reg_dim)
    # mapping output matches the gen latent
    assert trainer.map.output_shape == (32, 32, 256)


def test_synth_config_loads():
    cfg = NetConfig(os.path.join(REPO, "exps", "synth.yaml"))
    assert cfg.datasets["train_a"]["class_name"] == "dataset_hand_synth"


def test_bf16_cli_flag_sets_compute_dtype():
    """--bf16 maps to hyperparameters.compute_dtype=bfloat16
    (cli/common.py); without it the config default stands."""
    from lsps_tpu.cli import common as C

    parser = C.base_parser("t")
    opts = parser.parse_args(["--config", "exps/synth.yaml", "--bf16"])
    config = C.load_experiment(opts)
    assert config.hyperparameters["compute_dtype"] == "bfloat16"

    opts = parser.parse_args(["--config", "exps/synth.yaml"])
    config = C.load_experiment(opts)
    assert "compute_dtype" not in config.hyperparameters


def test_synth_full_config_parses():
    """The full-size stress config mirrors nnyu.yaml's net shapes."""
    from lsps_tpu.config import NetConfig

    cfg = NetConfig("exps/synth_full.yaml")
    assert cfg.hyperparameters["gen"]["ch"] == 64
    assert cfg.hyperparameters["dis"]["ch"] == 64
    assert cfg.hyperparameters["map"]["output_ch"] == 256
    assert cfg.hyperparameters["vae"]["input_dim"] == 108
