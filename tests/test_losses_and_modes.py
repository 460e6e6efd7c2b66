"""Loss-formula unit tests against hand-computed values and torch, plus
the estimate5 resume path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsps_tpu.train import trainer as T


def test_kl_loss_formulas():
    mu = jnp.array([[1.0, 2.0], [3.0, 0.0]])
    # without sd: mean(mu^2) (lsps_trainer.py:57-58)
    assert float(T.kl_loss(mu)) == pytest.approx((1 + 4 + 9 + 0) / 4)
    sd = jnp.array([[1.0, 1.0], [2.0, 1.0]])
    # with sd: sum(mu^2 + sd^2 - log sd^2) / B (lsps_trainer.py:59-60)
    expect = ((1 + 1 - 0) + (4 + 1 - 0)
              + (9 + 4 - np.log(4.0)) + (0 + 1 - 0)) / 2
    assert float(T.kl_loss(mu, sd)) == pytest.approx(expect, rel=1e-6)


def test_bce_logit_forms_match_torch():
    import torch
    import torch.nn.functional as F

    logits = np.array([-2.0, -0.5, 0.0, 0.7, 3.0], np.float32)
    lt = torch.from_numpy(logits)
    ones = F.binary_cross_entropy(torch.sigmoid(lt),
                                  torch.ones_like(lt)).item()
    zeros = F.binary_cross_entropy(torch.sigmoid(lt),
                                   torch.zeros_like(lt)).item()
    assert float(T.bce_logits_vs_ones(jnp.array(logits))) == pytest.approx(
        ones, rel=1e-5)
    assert float(T.bce_logits_vs_zeros(jnp.array(logits))) == pytest.approx(
        zeros, rel=1e-5)


def test_accuracy_formulas():
    logits = jnp.array([-1.0, 0.0, 2.0, 3.0])
    # sigmoid >= 0.5 <=> logits >= 0 (helpers.py:20-32)
    assert float(T.true_acc(logits)) == pytest.approx(0.75)
    assert float(T.fake_acc(logits)) == pytest.approx(0.5)


def test_l1_l2_losses():
    a = jnp.array([[1.0, 2.0]])
    b = jnp.array([[0.0, 4.0]])
    assert float(T.l1_loss(a, b)) == pytest.approx(1.5)
    assert float(T.l2_loss(a, b)) == pytest.approx(2.5)


def test_estimate5_resume_path(tmp_path):
    """estimate5 resumes from est_-prefixed checkpoints
    (lsps_trainer.py:280, depth_train.py:128)."""
    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.train import LSPSTrainer

    hyp = default_hyperparameters(reg_dim=12, small=True)
    hyp["vae"]["input_dim"] = 12
    hyp["dis"]["reg_dim"] = 12
    hyp["dis"]["ch"] = 4
    hyp["gen"]["ch"] = 4
    hyp["map"]["output_ch"] = 16
    tr = LSPSTrainer(hyp)
    state = tr.init_state(jax.random.PRNGKey(0))
    prefix = str(tmp_path / "pre")

    # save under the estimate prefix, as the loop does
    tr.save(state, prefix + "_est", 9)
    perturbed = jax.tree_util.tree_map(lambda x: x + 1.0, state["params"])
    st2 = {"params": perturbed, "opt": state["opt"], "step": state["step"]}
    st3, iters = tr.resume(st2, prefix, est=True)
    assert iters == 10
    a = jax.tree_util.tree_leaves(st3["params"]["gen"])[0]
    b = jax.tree_util.tree_leaves(state["params"]["gen"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
