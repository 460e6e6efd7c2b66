"""Trainer tests: one step of each update rule on tiny models, schedule
parity with torch MultiStepLR, checkpoint roundtrip."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.train import LSPSTrainer
from lsps_tpu.train.optim import multistep_lr
from lsps_tpu.train import checkpoint as ckpt

HYP = default_hyperparameters(reg_dim=12, small=True)
HYP["vae"]["input_dim"] = 12
HYP["dis"]["reg_dim"] = 12
HYP["dis"]["ch"] = 4
HYP["gen"]["ch"] = 4
HYP["map"]["output_ch"] = 16

B = 2
IMG = np.zeros((B, 128, 128, 1), np.float32)
LBL = np.zeros((B, 12), np.float32)


@pytest.fixture(scope="module")
def trainer():
    return LSPSTrainer(HYP)


@pytest.fixture(scope="module")
def state(trainer):
    return trainer.init_state(jax.random.PRNGKey(0))


def _leaf_delta(a, b):
    return max(float(jnp.max(jnp.abs(x - y)))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_vae_update_decreases_loss(trainer, state):
    rng = np.random.RandomState(1)
    y = jnp.array(rng.randn(8, 12) * 0.3, jnp.float32)
    s = state
    losses = []
    for i in range(5):
        s, metrics, dec = trainer.vae_update(s, y, jax.random.PRNGKey(i))
        losses.append(float(metrics["vae_total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # only vae params changed
    assert _leaf_delta(s["params"]["vae"], state["params"]["vae"]) > 0
    assert _leaf_delta(s["params"]["gen"], state["params"]["gen"]) == 0


def test_dis_and_gen_update(trainer, state):
    img_a = jnp.array(np.random.RandomState(2).randn(*IMG.shape) * 0.2,
                      jnp.float32)
    img_b = jnp.array(np.random.RandomState(3).randn(*IMG.shape) * 0.2,
                      jnp.float32)
    lbl = jnp.array(LBL)
    s1, dmetrics, _ = trainer.dis_update(state, img_a, lbl, img_b, lbl,
                                         jax.random.PRNGKey(10))
    for k in ["dis_ad_loss", "dis_feat_loss", "dis_loss", "dis_true_acc",
              "dis_fake_acc"]:
        assert np.isfinite(float(dmetrics[k])), k
    assert 0.0 <= float(dmetrics["dis_true_acc"]) <= 1.0
    assert _leaf_delta(s1["params"]["dis"], state["params"]["dis"]) > 0
    assert _leaf_delta(s1["params"]["gen"], state["params"]["gen"]) == 0

    s2, gmetrics, outs = trainer.gen_update(s1, img_a, lbl, img_b, lbl,
                                            jax.random.PRNGKey(11))
    for k in ["gen_enc_loss", "gen_enc_loss2", "gen_ad_loss", "gen_ll_loss",
              "gen_ll_loss2", "gen_total_loss"]:
        assert np.isfinite(float(gmetrics[k])), k
    assert len(outs) == 8
    assert outs[0].shape == IMG.shape
    assert _leaf_delta(s2["params"]["gen"], s1["params"]["gen"]) > 0
    assert _leaf_delta(s2["params"]["dis"], s1["params"]["dis"]) == 0
    # assemble_outputs builds the 10-panel strip
    strip = trainer.assemble_outputs(img_a, img_b, outs)
    assert strip.shape == (1, 128, 1280, 1)


def test_pretrain_update_matches_sequential_dis_then_gen(trainer, state):
    """The fused one-program pretrain step must be bit-equivalent to
    dispatching dis_update(r1) then gen_update(r2) with
    (r1, r2) = split(rng) — the reference loop order
    (depth_train.py:153-161)."""
    img_a = jnp.array(np.random.RandomState(6).randn(*IMG.shape) * 0.2,
                      jnp.float32)
    img_b = jnp.array(np.random.RandomState(7).randn(*IMG.shape) * 0.2,
                      jnp.float32)
    lbl = jnp.array(LBL)
    rng = jax.random.PRNGKey(21)

    sf, mf, outs_f = trainer.pretrain_update(state, img_a, lbl, img_b,
                                             lbl, rng)

    r1, r2 = jax.random.split(rng)
    s1, dm, _ = trainer.dis_update(state, img_a, lbl, img_b, lbl, r1)
    s2, gm, outs_s = trainer.gen_update(s1, img_a, lbl, img_b, lbl, r2)

    assert set(mf) == set(dm) | set(gm)
    for k, v in {**dm, **gm}.items():
        np.testing.assert_allclose(np.asarray(mf[k]), np.asarray(v),
                                   rtol=1e-6, atol=1e-6, err_msg=k)
    assert _leaf_delta(sf["params"], s2["params"]) < 1e-6
    for a, b in zip(outs_f, outs_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", [0, 1, 3, 4])
def test_post_update_modes(trainer, state, mode):
    img = jnp.array(np.random.RandomState(4).randn(*IMG.shape) * 0.2,
                    jnp.float32)
    lbl = jnp.array(np.random.RandomState(5).randn(B, 12) * 0.3, jnp.float32)
    s, metrics, outs = trainer.post_update(state, img, lbl, img, lbl,
                                           jax.random.PRNGKey(12), mode=mode)
    assert np.isfinite(float(metrics["dis_reg_loss"]))
    assert np.isfinite(float(metrics["dis_total_loss"]))
    assert len(outs) == 8
    assert _leaf_delta(s["params"]["dis"], state["params"]["dis"]) > 0


def test_multistep_lr_matches_torch_semantics():
    # dis/gen: milestones [200,300,400,450] (x1000 iters), gamma 0.5
    sched = multistep_lr(1e-4, (200, 300, 400, 450), 0.5, 1000)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(199998)) == pytest.approx(1e-4)
    # sch.step() fires before the update at it=199999 ((it+1)%1000==0)
    assert float(sched(199999)) == pytest.approx(5e-5)
    assert float(sched(299999)) == pytest.approx(2.5e-5)
    assert float(sched(449999)) == pytest.approx(1e-4 * 0.5 ** 4)
    # vae: [125,175], gamma 0.1
    vs = multistep_lr(1e-3, (125, 175), 0.1, 1000)
    assert float(vs(124998)) == pytest.approx(1e-3)
    assert float(vs(124999)) == pytest.approx(1e-4)
    assert float(vs(174999)) == pytest.approx(1e-5)
    # estimate mode steps every 100 iters (depth_train.py:163-164)
    es = multistep_lr(1e-4, (200, 300, 400, 450), 0.5, 100)
    assert float(es(19999)) == pytest.approx(5e-5)


def test_checkpoint_roundtrip(trainer, state, tmp_path):
    prefix = str(tmp_path / "run" / "pre")
    trainer.save(state, prefix, 41)
    assert os.path.isfile(prefix + "_gen_00000042.npz")
    assert os.path.isfile(prefix + "_dis_00000042.npz")
    trainer.save_vae(state, prefix, 41, 2.5)
    assert os.path.isfile(prefix + "_vae_2.50_00000042.npz")

    # perturb then resume restores the saved values
    perturbed = jax.tree_util.tree_map(lambda x: x + 1.0, state["params"])
    st2 = {"params": perturbed, "opt": state["opt"], "step": state["step"]}
    st3, iters = trainer.resume(st2, prefix, load_opt=True)
    assert iters == 42
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(st3["params"]["gen"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state["params"]["gen"])[0]))
    st4, ok = trainer.load_vae(st2, prefix, 2.5)
    assert ok
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(st4["params"]["vae"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state["params"]["vae"])[0]))


def test_resume_opt_must_match_params_step(trainer, state, tmp_path):
    """An interrupted save (params written, optimizer fetch killed) must
    not pair params@N with the latest-by-name opt@M<N — mismatched Adam
    moments corrupt the resumed trajectory.  Found live: a tunnel hang
    at the 10k snapshot left gen/dis/map/optg@10000 on disk with optd
    only at 5000."""
    prefix = str(tmp_path / "run" / "pre")
    # complete set at step 10 with a distinctive opt state
    old = {"params": state["params"], "step": state["step"],
           "opt": jax.tree_util.tree_map(lambda x: x + 7.0, state["opt"])}
    trainer.save(old, prefix, 9)
    # interrupted set at step 20: optd never written
    trainer.save(state, prefix, 19)
    os.remove(prefix + "_optd_00000020.npz")

    fresh = {"params": state["params"], "opt": state["opt"],
             "step": state["step"]}
    st, iters = trainer.resume(fresh, prefix, load_opt=True)
    assert iters == 20
    # dis opt must NOT have been filled from the stale step-10 file —
    # it restarts fresh (with only the LR-schedule count seeded to 20)
    expect = trainer._seed_schedule_count(state["opt"]["dis"], 20)
    assert _leaf_delta(st["opt"]["dis"], expect) == 0
    assert trainer.ckpt.last_opt_loaded is False

    # and a complete set resumes opt normally
    os.remove(prefix + "_gen_00000020.npz")
    st2, iters2 = trainer.resume(fresh, prefix, load_opt=True)
    assert iters2 == 10
    assert _leaf_delta(st2["opt"]["dis"], old["opt"]["dis"]) == 0
    assert trainer.ckpt.last_opt_loaded is True


def test_torch_convert_roundtrip():
    """Converter maps a torch module onto our template by name."""
    import torch
    import torch.nn as nn

    from lsps_tpu.ops import layers as L
    from lsps_tpu.train.torch_convert import convert_state_dict

    tm = nn.Sequential(nn.Conv2d(3, 5, 3, 2, 1), nn.LeakyReLU(),
                       nn.ConvTranspose2d(5, 4, 3, 2, 1, output_padding=1),
                       nn.LeakyReLU())
    ours = L.sequential(L.conv2d(3, 5, 3, 2, 1), L.leaky_relu_layer(),
                        L.conv2d_transpose(5, 4, 3, 2, 1, 1),
                        L.leaky_relu_layer())
    template = ours.init(jax.random.PRNGKey(0))
    converted = convert_state_dict(tm.state_dict(), template)

    x = np.random.RandomState(0).randn(1, 8, 8, 3).astype(np.float32)
    y_ours = np.asarray(ours.apply(converted, jnp.array(x)))
    with torch.no_grad():
        y_torch = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(y_ours, y_torch.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_torch_convert_wrapper_model_names():
    """The reference wraps primitives in one-module Sequentials named
    ``model`` (common_net.py); names like x.0.model.0.weight must land on
    our flattened paths."""
    import torch
    import torch.nn as nn

    from lsps_tpu.ops import layers as L
    from lsps_tpu.train.torch_convert import convert_state_dict

    class Wrapped(nn.Module):
        def __init__(self, n_in, n_out):
            super().__init__()
            self.model = nn.Sequential(nn.Conv2d(n_in, n_out, 3, 1, 1),
                                       nn.LeakyReLU())

        def forward(self, x):
            return self.model(x)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.encode_A = nn.Sequential(Wrapped(1, 4), Wrapped(4, 4))
            self.D = nn.Conv2d(4, 1, 1)

        def forward(self, x):
            return self.D(self.encode_A(x))

    tm = Net()

    class Ours:
        def __init__(self):
            self.encode_A = L.sequential(
                L.leaky_relu_conv2d(1, 4, 3, 1, 1),
                L.leaky_relu_conv2d(4, 4, 3, 1, 1))
            self.D = L.conv2d(4, 1, 1, 1, 0)

        def init(self, key):
            k1, k2 = jax.random.split(key)
            return {"encode_A": self.encode_A.init(k1),
                    "D": self.D.init(k2)}

        def apply(self, p, x):
            return self.D.apply(p["D"],
                                self.encode_A.apply(p["encode_A"], x))

    ours = Ours()
    template = ours.init(jax.random.PRNGKey(0))
    converted = convert_state_dict(tm.state_dict(), template)
    x = np.random.RandomState(1).randn(1, 8, 8, 1).astype(np.float32)
    y_ours = np.asarray(ours.apply(converted, jnp.array(x)))
    with torch.no_grad():
        y_torch = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(y_ours, y_torch.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)
