"""Full-model forward parity vs torch-composed reference nets.

Per-op parity (tests/test_ops_torch_parity.py) proves each primitive
matches PyTorch; these tests prove the *wiring* does: each reference
network (poseVAE, SharedResGen, SharedDis, Mapping — semantics of
src/trainers/lsps_nets.py:8-387 built on the blocks of
src/trainers/common_net.py) is composed here in torch at small channel
counts, its state_dict is pushed through
``lsps_tpu.train.torch_convert.convert_state_dict`` (the same converter
that will load released checkpoints), and every public forward path is
asserted equal to our JAX models to ~1e-4.

The torch modules below are original test doubles written from the
architecture spec in SURVEY.md §2.3; module attribute names match the
reference so the converter's name mapping is exercised end-to-end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsps_tpu.config import default_hyperparameters  # noqa: E402
from lsps_tpu.models import build_model  # noqa: E402
from lsps_tpu.train.torch_convert import convert_state_dict  # noqa: E402

CH = 4
REG = 12
HYP = default_hyperparameters(reg_dim=REG, small=True)
HYP["vae"]["input_dim"] = REG
HYP["dis"]["reg_dim"] = REG
HYP["dis"]["ch"] = CH
HYP["gen"]["ch"] = CH
HYP["map"]["output_ch"] = 4 * CH

ATOL = 2e-4
RTOL = 1e-4


# ---------------------------------------------------------------------------
# torch building blocks (common_net.py semantics; names must normalize to
# our leaf paths — wrapper Sequentials are called `model` so the converter
# drops them)
# ---------------------------------------------------------------------------

class LeakyReLUConv2d(nn.Module):
    def __init__(self, n_in, n_out, k, s, p):
        super().__init__()
        self.model = nn.Sequential(
            nn.Conv2d(n_in, n_out, k, s, p), nn.LeakyReLU())

    def forward(self, x):
        return self.model(x)


class LeakyReLUConvTranspose2d(nn.Module):
    def __init__(self, n_in, n_out, k, s, p, op=0):
        super().__init__()
        self.model = nn.Sequential(
            nn.ConvTranspose2d(n_in, n_out, k, s, p, output_padding=op),
            nn.LeakyReLU())

    def forward(self, x):
        return self.model(x)


class LeakyINSResBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.model = nn.Sequential(
            nn.Conv2d(ch, ch, 3, 1, 1), nn.InstanceNorm2d(ch),
            nn.LeakyReLU(), nn.Conv2d(ch, ch, 3, 1, 1),
            nn.InstanceNorm2d(ch))

    def forward(self, x):
        return x + self.model(x)


class LeakyReLULinear(nn.Module):
    def __init__(self, n_in, n_out):
        super().__init__()
        self.model = nn.Sequential(nn.Linear(n_in, n_out), nn.LeakyReLU())

    def forward(self, x):
        return self.model(x)


class GaussianNoise(nn.Module):
    def forward(self, x):  # eval mode: identity (common_net.py:36-38)
        return x


# ---------------------------------------------------------------------------
# torch reference nets at test size
# ---------------------------------------------------------------------------

class TorchPoseVAE(nn.Module):
    def __init__(self, input_dim, z_dim, h_dim):
        super().__init__()
        self.en_fc1 = nn.Linear(input_dim, h_dim)
        self.en_mu = nn.Linear(h_dim, z_dim)
        self.en_sigma = nn.Linear(h_dim, z_dim)
        self.de_fc1 = LeakyReLULinear(z_dim, h_dim)
        self.de_fc2 = nn.Linear(h_dim, input_dim)

    def encode(self, y):
        h = nn.functional.leaky_relu(self.en_fc1(y))
        mu = self.en_mu(h)
        sd = nn.functional.softplus(self.en_sigma(h))
        return mu, sd

    def decode(self, z):
        return self.de_fc2(self.de_fc1(z))


class TorchSharedDis(nn.Module):
    def __init__(self, ch, n_front, n_shared, post_dim):
        super().__init__()

        def front():
            lays, tch = [LeakyReLUConv2d(1, ch, 7, 2, 3)], ch
            for _ in range(1, n_front):
                lays.append(LeakyReLUConv2d(tch, tch * 2, 3, 2, 1))
                tch *= 2
            return nn.Sequential(*lays), tch

        self.model_A, tch = front()
        self.model_B, _ = front()
        shared = []
        for _ in range(n_shared):
            shared.append(LeakyReLUConv2d(tch, tch * 2, 3, 2, 1))
            tch *= 2
        self.model_S = nn.Sequential(*shared)
        self.D = nn.Conv2d(tch, 1, 1, 1, 0)
        self.Post = nn.Conv2d(tch, post_dim, 2, 1, 0)

    def forward(self, x_a, x_b):
        f = torch.cat([self.model_A(x_a), self.model_B(x_b)], 0)
        f = self.model_S(f)
        d = self.D(f)
        n = f.shape[0] // 2
        return (d[:n].reshape(-1), d[n:].reshape(-1), f[:n], f[n:])

    def regress_b(self, x_b):
        f = self.model_S(self.model_B(x_b))
        return self.Post(f).reshape(x_b.shape[0], -1)

    def regress_a(self, x_a):
        f = self.model_S(self.model_A(x_a))
        return self.Post(f).reshape(x_a.shape[0], -1)

    def feats(self, x_aa, x_ba, x_ab, x_bb):
        fa = self.model_A(torch.cat([x_aa, x_ba], 0))
        fb = self.model_B(torch.cat([x_ab, x_bb], 0))
        f = self.model_S(torch.cat([fa, fb], 0))
        n = f.shape[0] // 4
        return f[:n], f[n:2 * n], f[2 * n:3 * n], f[3 * n:]


class TorchSharedResGen(nn.Module):
    def __init__(self, ch, n_enc_front, n_enc_res, n_enc_shared,
                 n_gen_shared, n_gen_res, n_gen_front):
        super().__init__()

        def enc_front():
            lays, tch = [LeakyReLUConv2d(1, ch, 7, 1, 3)], ch
            for _ in range(1, n_enc_front):
                lays.append(LeakyReLUConv2d(tch, tch * 2, 3, 2, 1))
                tch *= 2
            return lays, tch

        encA, tch = enc_front()
        encB, _ = enc_front()
        for _ in range(n_enc_res):
            encA.append(LeakyINSResBlock(tch))
            encB.append(LeakyINSResBlock(tch))
        self.encode_A = nn.Sequential(*encA)
        self.encode_B = nn.Sequential(*encB)
        self.enc_shared = nn.Sequential(
            *([LeakyINSResBlock(tch) for _ in range(n_enc_shared)]
              + [GaussianNoise()]))
        self.dec_shared = nn.Sequential(
            *[LeakyINSResBlock(tch) for _ in range(n_gen_shared)])

        def dec_front(t):
            lays = [LeakyINSResBlock(t) for _ in range(n_gen_res)]
            for _ in range(1, n_gen_front):
                lays.append(LeakyReLUConvTranspose2d(t, t // 2, 3, 2, 1,
                                                     op=1))
                t //= 2
            lays += [nn.ConvTranspose2d(t, 1, 1, 1, 0), nn.Tanh()]
            return nn.Sequential(*lays)

        self.decode_A = dec_front(tch)
        self.decode_B = dec_front(tch)

    def forward(self, x_a, x_b):
        n = x_a.shape[0]
        out = torch.cat([self.encode_A(x_a), self.encode_B(x_b)], 0)
        shared = self.enc_shared(out)
        out = self.dec_shared(shared)
        out_a, out_b = self.decode_A(out), self.decode_B(out)
        return out_a[:n], out_a[n:], out_b[:n], out_b[n:], shared

    def forward_a2b(self, x_a):
        shared = self.enc_shared(self.encode_A(x_a))
        return self.decode_B(self.dec_shared(shared)), shared

    def forward_b2a(self, x_b):
        shared = self.enc_shared(self.encode_B(x_b))
        return self.decode_A(self.dec_shared(shared)), shared

    def decode(self, z):
        out = self.dec_shared(z)
        return self.decode_A(out), self.decode_B(out)


class TorchMapping(nn.Module):
    def __init__(self, input_dim, ch):
        super().__init__()
        self.model = nn.Sequential(
            LeakyReLUConvTranspose2d(input_dim, 4 * ch, 4, 1, 0),
            LeakyReLUConvTranspose2d(4 * ch, 4 * ch, 4, 2, 1),
            LeakyReLUConvTranspose2d(4 * ch, 2 * ch, 4, 2, 1),
            nn.ConvTranspose2d(2 * ch, ch, 4, 2, 1))

    def forward(self, z):
        return self.model(z[:, :, None, None])


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _tnp(t):
    return t.detach().numpy()


def _close(jax_arr, torch_t, msg=""):
    np.testing.assert_allclose(np.asarray(jax_arr), _tnp(torch_t),
                               rtol=RTOL, atol=ATOL, err_msg=msg)


def _close_img(jax_nhwc, torch_nchw, msg=""):
    np.testing.assert_allclose(
        np.asarray(jax_nhwc), _tnp(torch_nchw).transpose(0, 2, 3, 1),
        rtol=RTOL, atol=ATOL, err_msg=msg)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_pose_vae_full_forward_parity():
    torch.manual_seed(0)
    tm = TorchPoseVAE(REG, HYP["vae"]["z_dim"], HYP["vae"]["h_dim"]).eval()
    jm = build_model(HYP["vae"])
    params = convert_state_dict(tm.state_dict(),
                                jm.init(jax.random.PRNGKey(0)))

    y = torch.randn(5, REG) * 0.4
    yj = jnp.asarray(y.numpy())
    with torch.no_grad():
        mu_t, sd_t = tm.encode(y)
        dec_t = tm.decode(mu_t)
    z, mu, sd = jm.encode(params, yj)        # rng=None -> z = mu
    _close(mu, mu_t, "vae mu")
    _close(sd, sd_t, "vae sd")
    _close(jm.decode(params, mu), dec_t, "vae decode")
    recons, z2, mu2, _ = jm(params, yj)
    _close(recons, dec_t, "vae full fwd")


def test_shared_dis_full_forward_parity():
    torch.manual_seed(1)
    tm = TorchSharedDis(CH, HYP["dis"]["n_front_layer"],
                        HYP["dis"]["n_shared_layer"],
                        HYP["dis"]["post_dim"]).eval()
    jm = build_model(HYP["dis"])
    params = convert_state_dict(tm.state_dict(),
                                jm.init(jax.random.PRNGKey(0)))

    xa = torch.randn(2, 1, 128, 128) * 0.3
    xb = torch.randn(2, 1, 128, 128) * 0.3
    with torch.no_grad():
        da_t, db_t, fa_t, fb_t = tm(xa, xb)
        ra_t = tm.regress_a(xa)
        rb_t = tm.regress_b(xb)
        f4_t = tm.feats(xa, xb, xa, xb)
    da, db, fa, fb = jm(params, _nhwc(xa), _nhwc(xb))
    _close(da, da_t, "dis D a")
    _close(db, db_t, "dis D b")
    _close_img(fa, fa_t, "dis feats a")
    _close_img(fb, fb_t, "dis feats b")
    _, ra, _ = jm.regress_a(params, _nhwc(xa))
    _, rb, _ = jm.regress_b(params, _nhwc(xb))
    # flatten order differs (NCHW vs NHWC) only when the Post map is >1x1
    # spatially; at 128 inputs it is 1x1, so the codes are directly equal
    _close(ra, ra_t, "dis regress_a")
    _close(rb, rb_t, "dis regress_b")
    f4 = jm.feats(params, _nhwc(xa), _nhwc(xb), _nhwc(xa), _nhwc(xb))
    for i, (j, t) in enumerate(zip(f4, f4_t)):
        _close_img(j, t, f"dis feats() tap {i}")


def test_shared_res_gen_full_forward_parity():
    torch.manual_seed(2)
    g = HYP["gen"]
    tm = TorchSharedResGen(CH, g["n_enc_front_blk"], g["n_enc_res_blk"],
                           g["n_enc_shared_blk"], g["n_gen_shared_blk"],
                           g["n_gen_res_blk"], g["n_gen_front_blk"]).eval()
    jm = build_model(g)
    params = convert_state_dict(tm.state_dict(),
                                jm.init(jax.random.PRNGKey(0)))

    xa = torch.randn(2, 1, 64, 64) * 0.3
    xb = torch.randn(2, 1, 64, 64) * 0.3
    with torch.no_grad():
        aa_t, ba_t, ab_t, bb_t, sh_t = tm(xa, xb)
        a2b_t, sh_ab_t = tm.forward_a2b(xa)
        b2a_t, sh_ba_t = tm.forward_b2a(xb)
        dec_a_t, dec_b_t = tm.decode(sh_t)
    aa, ba, ab, bb, sh = jm(params, _nhwc(xa), _nhwc(xb))
    _close_img(aa, aa_t, "gen x_aa")
    _close_img(ba, ba_t, "gen x_ba")
    _close_img(ab, ab_t, "gen x_ab")
    _close_img(bb, bb_t, "gen x_bb")
    _close_img(sh, sh_t, "gen shared")
    a2b, sh_ab = jm.forward_a2b(params, _nhwc(xa))
    _close_img(a2b, a2b_t, "gen a2b")
    _close_img(sh_ab, sh_ab_t, "gen a2b shared")
    b2a, sh_ba = jm.forward_b2a(params, _nhwc(xb))
    _close_img(b2a, b2a_t, "gen b2a")
    _close_img(sh_ba, sh_ba_t, "gen b2a shared")
    dec_a, dec_b = jm.decode(params, sh)
    _close_img(dec_a, dec_a_t, "gen decode a")
    _close_img(dec_b, dec_b_t, "gen decode b")


def test_mapping_full_forward_parity():
    torch.manual_seed(3)
    cfg = dict(HYP["map"])
    tm = TorchMapping(cfg["input_dim"], cfg["output_ch"]).eval()
    jm = build_model(cfg)
    params = convert_state_dict(tm.state_dict(),
                                jm.init(jax.random.PRNGKey(0)))
    z = torch.randn(3, cfg["input_dim"]) * 0.5
    with torch.no_grad():
        out_t = tm(z)
    out = jm(params, jnp.asarray(z.numpy()))
    _close_img(out, out_t, "mapping")


def test_to_state_dict_roundtrip_strict():
    """Reverse converter: our pytree loads back into the torch module
    with strict=True and bit-identical tensors (torch -> pytree ->
    torch roundtrip), so trained TPU weights can be checked from torch
    tooling."""
    from lsps_tpu.train.torch_convert import to_state_dict

    torch.manual_seed(3)
    tm = TorchSharedDis(CH, HYP["dis"]["n_front_layer"],
                        HYP["dis"]["n_shared_layer"],
                        HYP["dis"]["post_dim"]).eval()
    sd = tm.state_dict()
    jm = build_model(HYP["dis"])
    params = convert_state_dict(sd, jm.init(jax.random.PRNGKey(0)))

    back = to_state_dict(params, like=sd)
    assert set(back) == set(sd)
    tm2 = TorchSharedDis(CH, HYP["dis"]["n_front_layer"],
                         HYP["dis"]["n_shared_layer"],
                         HYP["dis"]["post_dim"]).eval()
    tm2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in back.items()}, strict=True)
    for k in sd:
        np.testing.assert_array_equal(_tnp(tm2.state_dict()[k]),
                                      _tnp(sd[k]), err_msg=k)
