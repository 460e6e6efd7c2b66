"""Shape/behavior tests for the model zoo against the reference topology
(exps/nnyu.yaml:31-60, shrunk channels for speed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.models import PoseVAE, SharedResGen, SharedResXGen, SharedDis, \
    Mapping, build_model

HYP = default_hyperparameters(reg_dim=108, small=True)  # ch=8
KEY = jax.random.PRNGKey(0)


def test_pose_vae_shapes_and_determinism():
    vae = PoseVAE(HYP["vae"])
    params = vae.init(KEY)
    y = jnp.array(np.random.RandomState(0).randn(4, 108), jnp.float32)
    rec, z, mu, sd = vae(params, y, rng=jax.random.PRNGKey(1))
    assert rec.shape == (4, 108) and z.shape == (4, 20)
    assert np.all(np.asarray(sd) > 0)  # softplus
    # without rng, encode returns mu deterministically
    z2, mu2, _ = vae.encode(params, y)
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(mu2))
    # mu/sd heads preset to N(0, 0.002): tiny weights
    assert np.abs(np.asarray(params["en_mu"]["w"])).max() < 0.02


def test_shared_gen_shapes():
    gen = SharedResGen(HYP["gen"])
    params = gen.init(KEY)
    x_a = jnp.zeros((2, 128, 128, 1))
    x_b = jnp.zeros((2, 128, 128, 1))
    x_aa, x_ba, x_ab, x_bb, shared = gen(params, x_a, x_b,
                                         rng=jax.random.PRNGKey(3),
                                         train=True)
    # latent: 128 / 2^(n_enc_front_blk-1) = 32; ch * 4
    assert shared.shape == (4, 32, 32, HYP["gen"]["ch"] * 4)
    for out in (x_aa, x_ba, x_ab, x_bb):
        assert out.shape == (2, 128, 128, 1)
        assert np.abs(np.asarray(out)).max() <= 1.0  # tanh
    x_bab, sh = gen.forward_a2b(params, x_ba)
    assert x_bab.shape == (2, 128, 128, 1)
    assert sh.shape == (2, 32, 32, HYP["gen"]["ch"] * 4)


def test_shared_resx_gen_shapes():
    cfg = dict(HYP["gen"])
    cfg["name"] = "SharedResXGen"
    cfg["n_resnext_k"] = 1
    cfg["n_resnext_c"] = 4
    gen = build_model(cfg)
    assert isinstance(gen, SharedResXGen)
    params = gen.init(KEY)
    out = gen(params, jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1)))
    assert out[0].shape == (1, 64, 64, 1)


def test_shared_dis_shapes():
    dis = SharedDis(HYP["dis"])
    params = dis.init(KEY)
    x = jnp.zeros((3, 128, 128, 1))
    out_a, out_b, feats_a, feats_b = dis(params, x, x)
    # front /4, shared /16 -> 2x2 spatial; D head 1x1 -> 4 logits/sample
    assert out_a.shape == (3 * 2 * 2,)
    assert feats_a.shape[1:3] == (2, 2)
    post, _, _ = dis.regress_b(params, x)
    assert post.shape == (3, HYP["dis"]["post_dim"])
    f4 = dis.feats(params, x, x, x, x)
    assert len(f4) == 4 and f4[0].shape == feats_a.shape


def test_mapping_matches_gen_latent():
    m = Mapping(HYP["map"])
    params = m.init(KEY)
    z = jnp.zeros((2, HYP["map"]["input_dim"]))
    out = m(params, z)
    assert out.shape == (2, 32, 32, HYP["map"]["output_ch"])


def test_registry_dispatch():
    for name in ["poseVAE", "SharedResGen", "SharedResXGen", "SharedDis",
                 "Mapping"]:
        cfg = {**{"poseVAE": HYP["vae"], "SharedResGen": HYP["gen"],
                  "SharedResXGen": HYP["gen"], "SharedDis": HYP["dis"],
                  "Mapping": HYP["map"]}[name], "name": name}
        assert build_model(cfg) is not None


def test_gen_jit_compiles_once():
    gen = SharedResGen(HYP["gen"])
    params = gen.init(KEY)
    fwd = jax.jit(lambda p, a, b, r: gen(p, a, b, rng=r, train=True))
    x = jnp.zeros((2, 64, 64, 1))
    out1 = fwd(params, x, x, jax.random.PRNGKey(0))
    out2 = fwd(params, x, x, jax.random.PRNGKey(1))
    # noise differs between rngs at train time
    assert np.abs(np.asarray(out1[0]) - np.asarray(out2[0])).max() > 0
