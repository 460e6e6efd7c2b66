"""K-step LOCKSTEP trajectory parity vs the reference's OWN trainer.

Round 4 pinned single-shot loss values for every update mode and one
post-Adam step for vae_update.  This module pins the training DYNAMICS
over time — the strongest accuracy-parity proxy available without real
NYU/ICVL data:

* ``test_pretrain_lockstep``: 6 alternating dis_update + gen_update
  iterations (the depth_train.py:153-161 loop shape) in float64 on
  both sides; per-step losses and the post-run parameters of all
  nets updated by the dis and gen+map optimizers must agree to f64
  precision.  Pins the shared gen+map Adam (lsps_trainer.py:27-28),
  the coupled (non-decoupled) weight decay order, moment/bias
  correction coupling across steps, and — with train_map off — that
  the untouched map net is NOT decayed (torch skips None-grad params).
* ``test_post_lockstep``: post_update mode-3/mode-4 sequence sharing
  the dis optimizer with the estimate-mode scheduler cadence
  (depth_train.py:162-166).
* ``test_vae_milestone_crossing_lockstep``: 130 vae steps at
  scheduler-interval 1 so the 125-epoch MultiStepLR milestone
  (lsps_trainer.py:34) is CROSSED mid-run; per-step losses, the LR
  value itself, and final params must track through the 10x drop.
* ``test_multistep_lr_sweep_vs_torch``: our pure-function LR schedule
  vs torch's MultiStepLR stepped 500 times, both milestone sets, at
  loop cadences 1 and 100 (depth_train.py:154-164).

Float64 discipline: torch nets are built and run under
``torch.set_default_dtype(float64)``; ours under ``jax.enable_x64`` —
so agreement at ~1e-9 is a wiring/dynamics check, not a tolerance game.
Noise sources are zeroed on both sides (ref_oracle.zero_noise_torch,
patched jax.random.normal).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import enable_x64  # noqa: E402

from lsps_tpu.config import default_hyperparameters  # noqa: E402
from lsps_tpu.train import LSPSTrainer  # noqa: E402
from lsps_tpu.train import optim  # noqa: E402
from lsps_tpu.train.trainer import TrainState  # noqa: E402
from lsps_tpu.train.torch_convert import (convert_state_dict,  # noqa: E402
                                          to_state_dict)

from ref_oracle import load_reference, zero_noise_torch  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/src/trainers"),
    reason="reference checkout not present")

CH = 4
REG = 12
# f64 lockstep tolerances: single-step forward parity is ~1e-12, but
# IN-conv BIASES have analytically-zero loss gradients (InstanceNorm
# cancels the shift), so their effective Adam input is wd*p + f64
# reduction noise and the (sqrt(nu)+eps) divide amplifies the noise
# difference; measured worst param drift over 6 steps: 4.8e-6 relative
# on one such bias element (weights: <2e-5 relative of a 1e-8-scale
# update).  1e-5/1e-8 is still 3+ orders below any f32 effect, so a
# semantic divergence (wrong decay, wrong grouping, wrong schedule —
# each >=1e-2 by construction) cannot hide in it.
TRAJ_RTOL = 1e-7
TRAJ_ATOL = 1e-8
PARAM_RTOL = 1e-5
PARAM_ATOL = 1e-8


def small_hyp(**over):
    hyp = default_hyperparameters(reg_dim=REG, small=True)
    hyp["vae"]["input_dim"] = REG
    hyp["dis"]["reg_dim"] = REG
    hyp["dis"]["ch"] = CH
    hyp["gen"]["ch"] = CH
    hyp["map"]["output_ch"] = 4 * CH
    hyp.update(over)
    return hyp


@pytest.fixture(scope="module", autouse=True)
def zero_jax_noise():
    mp = pytest.MonkeyPatch()
    mp.setattr(jax.random, "normal",
               lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape,
                                                                  dtype))
    yield
    mp.undo()


@pytest.fixture(scope="module")
def ref():
    return load_reference()


class f64_torch:
    """Default torch dtype -> float64 (the reference creates its BCE
    target tensors with torch.ones/zeros at call time, so update calls
    need this too, not just construction)."""

    def __enter__(self):
        self._prev = torch.get_default_dtype()
        torch.set_default_dtype(torch.float64)
        return self

    def __exit__(self, *exc):
        torch.set_default_dtype(self._prev)
        return False


def _convert64(torch_net, our_model):
    template = jax.tree.map(lambda l: jnp.asarray(l, jnp.float64),
                            our_model.init(jax.random.PRNGKey(0)))
    return convert_state_dict(torch_net.state_dict(), template)


def _make_pair_f64(ref, train_map=False, sch_interval=1000):
    """f64 reference LSPSTrainer + our LSPSTrainer with identical f64
    weights and FRESH optimizer states on both sides.  Call inside
    ``enable_x64()``."""
    hyp = small_hyp(train_map=train_map)
    with f64_torch():
        torch.manual_seed(11)
        rt = ref["LSPSTrainer"](hyp)
    rt.cuda(0)

    ours = LSPSTrainer(hyp, sch_interval=sch_interval)
    params = {
        "dis": _convert64(rt.dis, ours.dis),
        "gen": _convert64(rt.gen, ours.gen),
        "vae": _convert64(rt.vae, ours.vae),
        "map": _convert64(rt.map, ours.map),
    }
    opt = {
        "dis": ours.dis_opt.init(params["dis"]),
        "gen": ours.gen_opt.init({"gen": params["gen"],
                                  "map": params["map"]}),
        "vae": ours.vae_opt.init(params["vae"]),
    }
    return rt, ours, TrainState.create(params, opt), hyp


def _batch(k, n=6):
    rs = np.random.RandomState(1000 + k)
    ia = rs.uniform(-1, 1, (n, 1, 128, 128))
    ib = rs.uniform(-1, 1, (n, 1, 128, 128))
    la = rs.uniform(-0.3, 0.3, (n, REG))
    lb = rs.uniform(-0.3, 0.3, (n, REG))
    return ia, ib, la, lb


def _t(x):
    return torch.from_numpy(x)  # float64 ndarray -> float64 tensor


def _j_img(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def _m(metrics, key):
    return float(np.asarray(metrics[key]))


def _assert_params_match(our_params, torch_net, what, rtol=PARAM_RTOL,
                         atol=PARAM_ATOL):
    sd = torch_net.state_dict()
    ours_sd = to_state_dict(our_params, like=sd)
    for k, v in sd.items():
        np.testing.assert_allclose(
            ours_sd[k], v.detach().numpy(), rtol=rtol, atol=atol,
            err_msg=f"{what} param {k} after lockstep")


# ---------------------------------------------------------------------------
# pretrain: alternating dis+gen, K steps (depth_train.py:153-161)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("train_map", [False, True])
def test_pretrain_lockstep(ref, train_map):
    K, interval = 6, 2
    with enable_x64():
        rt, ours, state, hyp = _make_pair_f64(ref, train_map=train_map,
                                              sch_interval=interval)
        for k in range(K):
            ia, ib, la, lb = _batch(k)
            # loop cadence: scheduler steps BEFORE the update at
            # iterations where (it+1) % interval == 0
            if (k + 1) % interval == 0:
                rt.dis_sch.step()
                rt.gen_sch.step()
            with f64_torch(), zero_noise_torch():
                rt.dis_update(_t(ia), _t(la), _t(ib), _t(lb), None, None,
                              hyp)
                rt.gen_update(_t(ia), _t(la), _t(ib), _t(lb), hyp)
            state, dm, _ = ours.dis_update(
                state, _j_img(ia), jnp.asarray(la), _j_img(ib),
                jnp.asarray(lb), jax.random.PRNGKey(k))
            state, gm, _ = ours.gen_update(
                state, _j_img(ia), jnp.asarray(la), _j_img(ib),
                jnp.asarray(lb), jax.random.PRNGKey(1000 + k))
            for key, val in [("dis_loss", rt.dis_loss),
                             ("dis_ad_loss", rt.dis_ad_loss),
                             ("gen_total_loss", rt.gen_total_loss),
                             ("gen_ad_loss", rt.gen_ad_loss),
                             ("gen_ll_loss", rt.gen_ll_loss),
                             ("gen_enc_loss", rt.gen_enc_loss)]:
                m = dm if key.startswith("dis") else gm
                np.testing.assert_allclose(
                    _m(m, key), float(val), rtol=TRAJ_RTOL, atol=TRAJ_ATOL,
                    err_msg=f"step {k} {key} (train_map={train_map})")
        _assert_params_match(state["params"]["dis"], rt.dis, "dis")
        _assert_params_match(state["params"]["gen"], rt.gen, "gen")
        # gen+map share one Adam (lsps_trainer.py:27-28).  With
        # train_map off, torch leaves map untouched (None grads skip
        # decay too) — our zero-decay-reference masking must reproduce
        # that exactly; with train_map on, the shared moments and the
        # decay must both track.
        _assert_params_match(state["params"]["map"], rt.map, "map")
        if not train_map:
            np.testing.assert_array_equal(
                np.asarray(jax.tree_util.tree_leaves(
                    state["params"]["map"])[0]),
                np.asarray(jax.tree_util.tree_leaves(
                    _convert64(rt.map, ours.map))[0]),
                err_msg="map must be bitwise untouched with train_map off")


# ---------------------------------------------------------------------------
# estimate: post_update mode 3/4 sequence sharing the dis optimizer
# ---------------------------------------------------------------------------

def test_post_lockstep(ref):
    K, interval = 6, 2
    with enable_x64():
        rt, ours, state, hyp = _make_pair_f64(ref, sch_interval=interval)
        for k in range(K):
            ia, ib, la, lb = _batch(100 + k)
            mode = 3 if k % 2 == 0 else 4
            if (k + 1) % interval == 0:  # depth_train.py:163-164
                rt.dis_sch.step()
            with f64_torch(), zero_noise_torch():
                rt.post_update(_t(ia), _t(la), _t(ib), _t(lb), None, None,
                               mode, hyp)
            state, pm, _ = ours.post_update(
                state, _j_img(ia), jnp.asarray(la), _j_img(ib),
                jnp.asarray(lb), jax.random.PRNGKey(k), mode=mode,
                with_viz=False)
            np.testing.assert_allclose(
                _m(pm, "dis_total_loss"), float(rt.dis_total_loss),
                rtol=TRAJ_RTOL, atol=TRAJ_ATOL,
                err_msg=f"step {k} mode {mode} dis_total_loss")
            np.testing.assert_allclose(
                _m(pm, "dis_reg_loss"), float(rt.dis_reg_loss),
                rtol=TRAJ_RTOL, atol=TRAJ_ATOL,
                err_msg=f"step {k} mode {mode} dis_reg_loss")
        _assert_params_match(state["params"]["dis"], rt.dis, "post dis")


# ---------------------------------------------------------------------------
# vae: 130 steps at interval 1 — CROSSES the 125 MultiStepLR milestone
# ---------------------------------------------------------------------------

def test_vae_milestone_crossing_lockstep(ref):
    K = 130
    with enable_x64():
        rt, ours, state, hyp = _make_pair_f64(ref, sch_interval=1)
        lrs = []
        for k in range(K):
            rs = np.random.RandomState(5000 + k)
            y = rs.uniform(-0.4, 0.4, (8, REG))
            rt.vae_sch.step()  # interval 1: stepped before every update
            with f64_torch(), zero_noise_torch():
                rt.vae_update(_t(y), hyp)
            state, vm, _ = ours.vae_update(state, jnp.asarray(y),
                                           jax.random.PRNGKey(k))
            np.testing.assert_allclose(
                _m(vm, "vae_total_loss"), float(rt.vae_total_loss),
                rtol=TRAJ_RTOL, atol=TRAJ_ATOL,
                err_msg=f"step {k} vae_total_loss")
            torch_lr = rt.vae_opt.param_groups[0]["lr"]
            np.testing.assert_allclose(
                _m(vm, "vae_lr"), torch_lr, rtol=1e-12,
                err_msg=f"step {k} LR (scheduler epoch {k + 1})")
            lrs.append(torch_lr)
        # the milestone was actually crossed mid-run (lsps_trainer.py:34)
        base = hyp["lr"] * 10.0
        assert lrs[0] == pytest.approx(base, rel=1e-12)
        assert lrs[-1] == pytest.approx(base * 0.1, rel=1e-12)
        _assert_params_match(state["params"]["vae"], rt.vae, "vae",
                             rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# the LR schedule itself, swept across every milestone
# ---------------------------------------------------------------------------

def test_multistep_lr_sweep_vs_torch(ref):
    hyp = small_hyp()
    torch.manual_seed(0)
    rt = ref["LSPSTrainer"](hyp)
    lr = hyp["lr"]
    ours_1 = optim.multistep_lr(lr, optim.DIS_GEN_MILESTONES,
                                optim.DIS_GEN_GAMMA, 1)
    ours_100 = optim.multistep_lr(lr, optim.DIS_GEN_MILESTONES,
                                  optim.DIS_GEN_GAMMA, 100)
    vae_1 = optim.multistep_lr(lr * 10.0, optim.VAE_MILESTONES,
                               optim.VAE_GAMMA, 1)
    # rel 1e-6: the production schedule evaluates in f32 inside the
    # jitted update (torch holds f64 python floats); the claim under
    # test is the milestone ARITHMETIC, and a wrong gamma power or a
    # off-by-one epoch is a >= 10% jump.
    for epoch in range(500):
        rt.dis_sch.step()
        rt.vae_sch.step()
        t_dis = rt.dis_opt.param_groups[0]["lr"]
        t_vae = rt.vae_opt.param_groups[0]["lr"]
        # interval 1: the update at count=epoch sees (epoch+1)//1 steps
        assert float(ours_1(epoch)) == pytest.approx(t_dis, rel=1e-6), \
            f"dis/gen LR at epoch {epoch + 1}"
        assert float(vae_1(epoch)) == pytest.approx(t_vae, rel=1e-6), \
            f"vae LR at epoch {epoch + 1}"
        # interval 100 (estimate cadence): counts just after and just
        # before the scheduler boundary map to this torch epoch
        n = epoch + 1
        for count in (100 * n - 1, 100 * n):
            assert float(ours_100(count)) == pytest.approx(
                t_dis, rel=1e-6), \
                f"dis/gen LR at interval-100 count {count}"
