"""Parity against the reference's OWN code (the genuine artifact).

tests/test_full_model_torch_parity.py composes torch test doubles from
the architecture spec; a shared misreading of the reference would slip
through that.  Here the oracle is the reference itself: its actual
``poseVAE`` / ``SharedResGen`` / ``SharedResXGen`` / ``SharedDis`` /
``Mapping`` classes (src/trainers/lsps_nets.py:8-387, built on
common_net.py) are imported from /root/reference and run under this
environment's torch-CPU (tests/ref_oracle.py shims), their state_dicts
are pushed through the SAME converter that loads released checkpoints,
and:

* every public forward path is asserted equal to our JAX models — in
  FLOAT64 on both sides (torch ``.double()`` + ``jax
  .enable_x64``) at test channel counts, so agreement to ~1e-9 is a
  hard wiring check rather than a float-noise tolerance game; and in
  the production f32 at the shipped nnyu.yaml full size;
* the reference's ``LSPSTrainer`` update rules
  (src/trainers/lsps_trainer.py:62-262) are executed on fixed inputs
  with identical weights, and the LOSS VALUES of vae/gen/dis/post
  (modes 0/1/3/4, train_map on and off) must match the metrics our
  jitted updates report;
* one full vae_update step must produce the same post-Adam parameters
  (couples gradients, weight decay coupling, betas, lr and schedule).

Stochastic layers are made deterministic on both sides: torch noise
sources return zeros (ref_oracle.zero_noise_torch) and
``jax.random.normal`` is patched to zeros for the module (the jitted
updates trace under the patch).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import enable_x64  # noqa: E402

from lsps_tpu.config import default_hyperparameters, load_config  # noqa: E402
from lsps_tpu.models import build_model  # noqa: E402
from lsps_tpu.train import LSPSTrainer  # noqa: E402
from lsps_tpu.train.torch_convert import (convert_state_dict,  # noqa: E402
                                          to_state_dict)

from ref_oracle import load_reference, zero_noise_torch  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/src/trainers"),
    reason="reference checkout not present")

CH = 4
REG = 12
ATOL = 2e-4
RTOL = 2e-4


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
    """jax.random.normal -> zeros for this module, so our stochastic
    paths (poseVAE reparam, GaussianNoiseLayer) match the zeroed torch
    noise.  Uniform inits and key splitting stay untouched."""
    mp = pytest.MonkeyPatch()
    mp.setattr(jax.random, "normal",
               lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape,
                                                                  dtype))
    yield
    mp.undo()


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _tnp(t):
    return t.detach().numpy()


def _close(jax_arr, torch_t, msg="", rtol=RTOL, atol=ATOL):
    # compare in f64 — casting to f32 would floor the achievable
    # tolerance at f32 eps and defeat the float64 oracle
    np.testing.assert_allclose(np.asarray(jax_arr, np.float64), _tnp(torch_t),
                               rtol=rtol, atol=atol, err_msg=msg)


def _close_img(jax_nhwc, torch_nchw, msg="", rtol=RTOL, atol=ATOL):
    np.testing.assert_allclose(
        np.asarray(jax_nhwc, np.float64),
        _tnp(torch_nchw).transpose(0, 2, 3, 1),
        rtol=rtol, atol=atol, err_msg=msg)


def _convert(torch_net, our_model):
    return convert_state_dict(torch_net.state_dict(),
                              our_model.init(jax.random.PRNGKey(0)))


def _convert64(torch_net, our_model):
    """Convert a ``.double()`` torch net to an f64 param pytree (call
    inside ``enable_x64()``)."""
    template = jax.tree.map(lambda l: jnp.asarray(l, jnp.float64),
                            our_model.init(jax.random.PRNGKey(0)))
    return convert_state_dict(torch_net.state_dict(), template)


# float64 forward parity: reduction-order noise is ~1e-13, so any
# disagreement above this is a genuine wiring difference.
ATOL64 = 1e-9
RTOL64 = 1e-9


# ---------------------------------------------------------------------------
# forward parity, test size
# ---------------------------------------------------------------------------

def test_ref_pose_vae_forward(ref):
    torch.manual_seed(0)
    tm = ref["nets"].poseVAE(small_hyp()["vae"]).double().eval()
    jm = build_model(small_hyp()["vae"])
    with enable_x64():
        params = _convert64(tm, jm)
        y = torch.randn(5, REG, dtype=torch.float64) * 0.4
        yj = jnp.asarray(y.numpy())
        with torch.no_grad(), zero_noise_torch():
            dec_t, z_t, mu_t, sd_t = tm(y)
        # rng=None -> z = mu = zeroed-noise z
        z, mu, sd = jm.encode(params, yj)
        _close(mu, mu_t, "vae mu", rtol=RTOL64, atol=ATOL64)
        _close(sd, sd_t, "vae sd", rtol=RTOL64, atol=ATOL64)
        _close(z, z_t, "vae z (zero noise)", rtol=RTOL64, atol=ATOL64)
        _close(jm.decode(params, mu), dec_t, "vae decode",
               rtol=RTOL64, atol=ATOL64)


def test_ref_shared_dis_forward(ref):
    torch.manual_seed(1)
    cfg = small_hyp()["dis"]
    tm = ref["nets"].SharedDis(cfg).double().eval()
    jm = build_model(cfg)
    with enable_x64():
        params = _convert64(tm, jm)
        xa = torch.randn(2, 1, 128, 128, dtype=torch.float64) * 0.3
        xb = torch.randn(2, 1, 128, 128, dtype=torch.float64) * 0.3
        with torch.no_grad():
            da_t, db_t, fa_t, fb_t = tm(xa, xb)
            _, ra_t, _ = tm.regress_a(xa)
            _, rb_t, _ = tm.regress_b(xb)
            f4_t = tm.feats(xa, xb, xa, xb)
        da, db, fa, fb = jm(params, _nhwc(xa), _nhwc(xb))
        _close(da, da_t, "dis D a", rtol=RTOL64, atol=ATOL64)
        _close(db, db_t, "dis D b", rtol=RTOL64, atol=ATOL64)
        _close_img(fa, fa_t, "dis feats a", rtol=RTOL64, atol=ATOL64)
        _close_img(fb, fb_t, "dis feats b", rtol=RTOL64, atol=ATOL64)
        _, ra, _ = jm.regress_a(params, _nhwc(xa))
        _, rb, _ = jm.regress_b(params, _nhwc(xb))
        _close(ra, ra_t, "dis regress_a", rtol=RTOL64, atol=ATOL64)
        _close(rb, rb_t, "dis regress_b", rtol=RTOL64, atol=ATOL64)
        for i, (j, t) in enumerate(zip(
                jm.feats(params, _nhwc(xa), _nhwc(xb), _nhwc(xa),
                         _nhwc(xb)), f4_t)):
            _close_img(j, t, f"dis feats() tap {i}",
                       rtol=RTOL64, atol=ATOL64)


@pytest.mark.parametrize("name", ["SharedResGen", "SharedResXGen"])
def test_ref_gen_forward(ref, name):
    torch.manual_seed(2)
    cfg = dict(small_hyp()["gen"], name=name)
    tm = getattr(ref["nets"], name)(cfg).double().eval()
    jm = build_model(cfg)
    with enable_x64():
        params = _convert64(tm, jm)
        xa = torch.randn(2, 1, 64, 64, dtype=torch.float64) * 0.3
        xb = torch.randn(2, 1, 64, 64, dtype=torch.float64) * 0.3
        with torch.no_grad():
            aa_t, ba_t, ab_t, bb_t, sh_t = tm(xa, xb)
            a2b_t, sh_ab_t = tm.forward_a2b(xa)
            b2a_t, sh_ba_t = tm.forward_b2a(xb)
            dec_a_t, dec_b_t = tm.decode(sh_t)
            enc_a_t, enc_b_t = tm.encode(xa, xb)
        aa, ba, ab, bb, sh = jm(params, _nhwc(xa), _nhwc(xb))
        for j, t, m in [(aa, aa_t, "x_aa"), (ba, ba_t, "x_ba"),
                        (ab, ab_t, "x_ab"), (bb, bb_t, "x_bb")]:
            _close_img(j, t, f"{name} {m}", rtol=RTOL64, atol=ATOL64)
        _close_img(sh, sh_t, f"{name} shared", rtol=RTOL64, atol=ATOL64)
        a2b, sh_ab = jm.forward_a2b(params, _nhwc(xa))
        _close_img(a2b, a2b_t, f"{name} a2b", rtol=RTOL64, atol=ATOL64)
        _close_img(sh_ab, sh_ab_t, f"{name} a2b shared",
                   rtol=RTOL64, atol=ATOL64)
        b2a, sh_ba = jm.forward_b2a(params, _nhwc(xb))
        _close_img(b2a, b2a_t, f"{name} b2a", rtol=RTOL64, atol=ATOL64)
        _close_img(sh_ba, sh_ba_t, f"{name} b2a shared",
                   rtol=RTOL64, atol=ATOL64)
        dec_a, dec_b = jm.decode(params, sh)
        _close_img(dec_a, dec_a_t, f"{name} decode a",
                   rtol=RTOL64, atol=ATOL64)
        _close_img(dec_b, dec_b_t, f"{name} decode b",
                   rtol=RTOL64, atol=ATOL64)
        enc_a, enc_b = jm.encode(params, _nhwc(xa), _nhwc(xb))
        _close_img(enc_a, enc_a_t, f"{name} encode a",
                   rtol=RTOL64, atol=ATOL64)
        _close_img(enc_b, enc_b_t, f"{name} encode b",
                   rtol=RTOL64, atol=ATOL64)


def test_ref_mapping_forward(ref):
    torch.manual_seed(3)
    cfg = small_hyp()["map"]
    tm = ref["nets"].Mapping(cfg).double().eval()
    jm = build_model(cfg)
    with enable_x64():
        params = _convert64(tm, jm)
        z = torch.randn(3, cfg["input_dim"], dtype=torch.float64) * 0.5
        with torch.no_grad():
            out_t = tm(z)
        _close_img(jm(params, jnp.asarray(z.numpy())), out_t, "mapping",
                   rtol=RTOL64, atol=ATOL64)


# ---------------------------------------------------------------------------
# forward parity at the SHIPPED config size (exps/nnyu.yaml)
# ---------------------------------------------------------------------------

def test_ref_full_size_serve_path_and_gen(ref):
    """The deployment-critical path (dis.regress_b -> vae.decode,
    SURVEY §3.4) plus the joint generator forward, at the exact shapes
    nnyu.yaml ships (ch=64, 108-d poses, 128x128 crops)."""
    hyp = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "exps", "nnyu.yaml")).hyp
    torch.manual_seed(4)
    t_dis = ref["nets"].SharedDis(hyp["dis"]).eval()
    t_vae = ref["nets"].poseVAE(hyp["vae"]).eval()
    t_gen = ref["nets"].SharedResGen(hyp["gen"]).eval()
    j_dis = build_model(hyp["dis"])
    j_vae = build_model(hyp["vae"])
    j_gen = build_model(hyp["gen"])
    p_dis = _convert(t_dis, j_dis)
    p_vae = _convert(t_vae, j_vae)
    p_gen = _convert(t_gen, j_gen)

    x = torch.randn(1, 1, 128, 128) * 0.4
    with torch.no_grad():
        _, post_t, _ = t_dis.regress_b(x)
        pose_t = t_vae.decode(post_t.reshape(1, -1))
        aa_t, ba_t, ab_t, bb_t, sh_t = t_gen(x, x)
    _, post, _ = j_dis.regress_b(p_dis, _nhwc(x))
    _close(post, post_t.reshape(1, -1), "full-size regress_b",
           rtol=1e-3, atol=5e-4)
    pose = j_vae.decode(p_vae, jnp.asarray(_tnp(post_t.reshape(1, -1))))
    _close(pose, pose_t, "full-size vae.decode", rtol=1e-3, atol=5e-4)
    aa, ba, ab, bb, sh = j_gen(p_gen, _nhwc(x), _nhwc(x))
    _close_img(aa, aa_t, "full-size gen x_aa", rtol=1e-3, atol=1e-3)
    _close_img(bb, bb_t, "full-size gen x_bb", rtol=1e-3, atol=1e-3)
    _close_img(sh, sh_t, "full-size gen shared", rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# loss-value parity: the reference's executable update rules as oracle
# ---------------------------------------------------------------------------

def _make_pair(ref, train_map=False):
    """Reference LSPSTrainer + our LSPSTrainer with identical weights.
    Returns (ref_trainer, ours, our_state, torch_batch, jax_batch)."""
    hyp = small_hyp(train_map=train_map)
    torch.manual_seed(5)
    rt = ref["LSPSTrainer"](hyp)
    rt.cuda(0)  # sets .gpu used by the update rules; no-op moves

    ours = LSPSTrainer(hyp)
    state = ours.init_state(jax.random.PRNGKey(0))
    state["params"] = {
        "dis": convert_state_dict(rt.dis.state_dict(),
                                  state["params"]["dis"]),
        "gen": convert_state_dict(rt.gen.state_dict(),
                                  state["params"]["gen"]),
        "vae": convert_state_dict(rt.vae.state_dict(),
                                  state["params"]["vae"]),
        "map": convert_state_dict(rt.map.state_dict(),
                                  state["params"]["map"]),
    }

    g = torch.Generator().manual_seed(7)
    tb = {
        "ia": torch.rand(6, 1, 128, 128, generator=g) * 2 - 1,
        "ib": torch.rand(6, 1, 128, 128, generator=g) * 2 - 1,
        "la": torch.rand(6, REG, generator=g) * 0.6 - 0.3,
        "lb": torch.rand(6, REG, generator=g) * 0.6 - 0.3,
        "y": torch.rand(6, REG, generator=g) * 0.8 - 0.4,
    }
    jb = {
        "ia": _nhwc(tb["ia"]), "ib": _nhwc(tb["ib"]),
        "la": jnp.asarray(_tnp(tb["la"])),
        "lb": jnp.asarray(_tnp(tb["lb"])),
        "y": jnp.asarray(_tnp(tb["y"])),
    }
    return rt, ours, state, tb, jb, hyp


def _metric(metrics, key):
    return float(np.asarray(metrics[key]))


def test_ref_vae_update_loss_and_step_parity(ref):
    rt, ours, state, tb, jb, hyp = _make_pair(ref)
    with zero_noise_torch():
        rt.vae_update(tb["y"], hyp)
    new_state, metrics, _ = ours.vae_update(state, jb["y"],
                                            jax.random.PRNGKey(1))
    np.testing.assert_allclose(_metric(metrics, "vae_total_loss"),
                               float(rt.vae_total_loss),
                               rtol=RTOL, atol=ATOL,
                               err_msg="vae_total_loss vs reference code")
    # one full Adam step: same gradients, coupled weight decay, lr x10
    ours_sd = to_state_dict(new_state["params"]["vae"],
                            like=rt.vae.state_dict())
    for k, v in rt.vae.state_dict().items():
        np.testing.assert_allclose(
            ours_sd[k], _tnp(v), rtol=1e-4, atol=2e-5,
            err_msg=f"post-step vae param {k}")


@pytest.mark.parametrize("feat_mat", [True, False])
def test_ref_dis_update_loss_parity(ref, feat_mat):
    rt, ours, state, tb, jb, hyp = _make_pair(ref)
    with zero_noise_torch():
        rt.dis_update(tb["ia"], tb["la"], tb["ib"], tb["lb"], None, None,
                      hyp, feat_mat=feat_mat)
    _, metrics, _ = ours.dis_update(state, jb["ia"], jb["la"], jb["ib"],
                                    jb["lb"], jax.random.PRNGKey(2),
                                    feat_mat=feat_mat)
    np.testing.assert_allclose(_metric(metrics, "dis_loss"),
                               float(rt.dis_loss), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_metric(metrics, "dis_ad_loss"),
                               float(rt.dis_ad_loss), rtol=RTOL, atol=ATOL)
    if feat_mat:
        np.testing.assert_allclose(_metric(metrics, "dis_feat_loss"),
                                   float(rt.dis_feat_loss),
                                   rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_metric(metrics, "dis_true_acc"),
                               float(rt.dis_true_acc), atol=1e-6)
    np.testing.assert_allclose(_metric(metrics, "dis_fake_acc"),
                               float(rt.dis_fake_acc), atol=1e-6)


@pytest.mark.parametrize("train_map", [False, True])
def test_ref_gen_update_loss_parity(ref, train_map):
    rt, ours, state, tb, jb, hyp = _make_pair(ref, train_map=train_map)
    with zero_noise_torch():
        rt.gen_update(tb["ia"], tb["la"], tb["ib"], tb["lb"], hyp)
    _, metrics, _ = ours.gen_update(state, jb["ia"], jb["la"], jb["ib"],
                                    jb["lb"], jax.random.PRNGKey(3))
    for key, val in [
        ("gen_total_loss", rt.gen_total_loss),
        ("gen_ad_loss", rt.gen_ad_loss),
        ("gen_ll_loss", rt.gen_ll_loss),
        ("gen_ll_loss2", rt.gen_ll_loss2),
        ("gen_enc_loss", rt.gen_enc_loss),
        ("gen_enc_loss2", rt.gen_enc_loss2),
    ]:
        np.testing.assert_allclose(_metric(metrics, key), float(val),
                                   rtol=2e-3, atol=5e-4, err_msg=key)
    if train_map:
        np.testing.assert_allclose(_metric(metrics, "gen_map_loss"),
                                   float(rt.gen_map_loss),
                                   rtol=2e-3, atol=5e-4)
        np.testing.assert_allclose(_metric(metrics, "gen_map_loss2"),
                                   float(rt.gen_map_loss2),
                                   rtol=2e-3, atol=5e-4)


def test_ref_dis_update_train_map_loss_parity(ref):
    """ndiv=4 path: decoded pose->depth fakes join the batch
    (lsps_trainer.py:147-158, 201-207)."""
    rt, ours, state, tb, jb, hyp = _make_pair(ref, train_map=True)
    with zero_noise_torch():
        rt.dis_update(tb["ia"], tb["la"], tb["ib"], tb["lb"], None, None,
                      hyp)
    _, metrics, _ = ours.dis_update(state, jb["ia"], jb["la"], jb["ib"],
                                    jb["lb"], jax.random.PRNGKey(4))
    np.testing.assert_allclose(_metric(metrics, "dis_loss"),
                               float(rt.dis_loss), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_metric(metrics, "dis_ad_loss"),
                               float(rt.dis_ad_loss), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("mode", [0, 1, 3, 4])
def test_ref_post_update_loss_parity(ref, mode):
    rt, ours, state, tb, jb, hyp = _make_pair(ref)
    with zero_noise_torch():
        rt.post_update(tb["ia"], tb["la"], tb["ib"], tb["lb"], None, None,
                       mode, hyp)
    _, metrics, _ = ours.post_update(state, jb["ia"], jb["la"], jb["ib"],
                                     jb["lb"], jax.random.PRNGKey(5),
                                     mode=mode, with_viz=False)
    np.testing.assert_allclose(_metric(metrics, "dis_total_loss"),
                               float(rt.dis_total_loss),
                               rtol=RTOL, atol=ATOL,
                               err_msg=f"post mode {mode} total")
    np.testing.assert_allclose(_metric(metrics, "dis_reg_loss"),
                               float(rt.dis_reg_loss),
                               rtol=RTOL, atol=ATOL,
                               err_msg=f"post mode {mode} reg")
