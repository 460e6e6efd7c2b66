"""UNIT-style dual-domain VAE-GAN generators with a shared latent space.

Reference: src/trainers/lsps_nets.py:164-272 (``SharedResGen``) and
:277-387 (``SharedResXGen``).  Per-domain conv encoders feed shared
residual blocks; a GaussianNoiseLayer reparameterizes the shared code;
per-domain deconv decoders reconstruct both domains.

TPU notes: both domains are concatenated along batch for one fused
forward (lsps_nets.py:250-258) — a single XLA program, MXU-friendly.
Activations NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsps_tpu.ops import layers as L
from lsps_tpu.registry import register


def _enc_front(input_dim, ch, n_front):
    lays = [L.leaky_relu_conv2d(input_dim, ch, 7, 1, 3)]
    tch = ch
    for _ in range(1, n_front):
        lays.append(L.leaky_relu_conv2d(tch, tch * 2, 3, 2, 1))
        tch *= 2
    return lays, tch


class _SharedGenBase:
    """Common structure; subclass picks the residual block flavor."""

    def _res_block(self, tch, dropout):
        raise NotImplementedError

    def __init__(self, cfg: dict):
        self.cfg = dict(cfg)
        ch = cfg["ch"]
        dropout = cfg.get("res_dropout_ratio", 0)
        in_a, in_b = cfg["input_dim_a"], cfg["input_dim_b"]
        n_enc_front = cfg["n_enc_front_blk"]
        n_enc_res = cfg["n_enc_res_blk"]
        n_enc_shared = cfg["n_enc_shared_blk"]
        n_gen_shared = cfg["n_gen_shared_blk"]
        n_gen_res = cfg["n_gen_res_blk"]
        n_gen_front = cfg["n_gen_front_blk"]

        encA, tch = _enc_front(in_a, ch, n_enc_front)
        encB, _ = _enc_front(in_b, ch, n_enc_front)
        for _ in range(n_enc_res):
            encA.append(self._res_block(tch, dropout))
            encB.append(self._res_block(tch, dropout))

        enc_shared = [self._res_block(tch, dropout)
                      for _ in range(n_enc_shared)]
        enc_shared.append(L.gaussian_noise_layer())
        dec_shared = [self._res_block(tch, dropout)
                      for _ in range(n_gen_shared)]

        decA, decB = [], []
        for _ in range(n_gen_res):
            decA.append(self._res_block(tch, dropout))
            decB.append(self._res_block(tch, dropout))
        for _ in range(1, n_gen_front):
            decA.append(L.leaky_relu_conv_transpose2d(tch, tch // 2, 3, 2, 1,
                                                      output_padding=1))
            decB.append(L.leaky_relu_conv_transpose2d(tch, tch // 2, 3, 2, 1,
                                                      output_padding=1))
            tch //= 2
        decA += [L.conv2d_transpose(tch, in_a, 1, 1, 0), L.tanh_layer()]
        decB += [L.conv2d_transpose(tch, in_b, 1, 1, 0), L.tanh_layer()]

        self.encode_A = L.sequential(*encA)
        self.encode_B = L.sequential(*encB)
        self.enc_shared = L.sequential(*enc_shared)
        self.dec_shared = L.sequential(*dec_shared)
        self.decode_A = L.sequential(*decA)
        self.decode_B = L.sequential(*decB)
        self.latent_ch = cfg["ch"] * (2 ** (n_enc_front - 1))

    def init(self, key):
        ks = jax.random.split(key, 6)
        return {
            "encode_A": self.encode_A.init(ks[0]),
            "encode_B": self.encode_B.init(ks[1]),
            "enc_shared": self.enc_shared.init(ks[2]),
            "dec_shared": self.dec_shared.init(ks[3]),
            "decode_A": self.decode_A.init(ks[4]),
            "decode_B": self.decode_B.init(ks[5]),
        }

    @staticmethod
    def _split(rng, n):
        return (jax.random.split(rng, n) if rng is not None
                else [None] * n)

    # -- reference API (lsps_nets.py:239-272) -------------------------------
    # rng/train thread through EVERY sub-network so configured res-block
    # dropout (res_dropout_ratio) is active everywhere, matching the
    # reference's global module train() mode.
    def decode(self, params, z, rng=None, train=False):
        r1, r2, r3 = self._split(rng, 3)
        out = self.dec_shared.apply(params["dec_shared"], z, rng=r1,
                                    train=train)
        out_a = self.decode_A.apply(params["decode_A"], out, rng=r2,
                                    train=train)
        out_b = self.decode_B.apply(params["decode_B"], out, rng=r3,
                                    train=train)
        return out_a, out_b

    def encode(self, params, x_a, x_b, rng=None, train=False):
        r1, r2, r3, r4 = self._split(rng, 4)
        out_a = self.enc_shared.apply(
            params["enc_shared"],
            self.encode_A.apply(params["encode_A"], x_a, rng=r1,
                                train=train), rng=r2, train=train)
        out_b = self.enc_shared.apply(
            params["enc_shared"],
            self.encode_B.apply(params["encode_B"], x_b, rng=r3,
                                train=train), rng=r4, train=train)
        return out_a, out_b

    def __call__(self, params, x_a, x_b, rng=None, train=False):
        """Joint forward over both domains concatenated on batch
        (lsps_nets.py:250-258). Returns (x_aa, x_ba, x_ab, x_bb, shared)."""
        n = x_a.shape[0]
        r1, r2, r3, r4, r5, r6 = self._split(rng, 6)
        out = jnp.concatenate([
            self.encode_A.apply(params["encode_A"], x_a, rng=r1,
                                train=train),
            self.encode_B.apply(params["encode_B"], x_b, rng=r2,
                                train=train)], axis=0)
        shared = self.enc_shared.apply(params["enc_shared"], out, rng=r3,
                                       train=train)
        out = self.dec_shared.apply(params["dec_shared"], shared, rng=r4,
                                    train=train)
        out_a = self.decode_A.apply(params["decode_A"], out, rng=r5,
                                    train=train)
        out_b = self.decode_B.apply(params["decode_B"], out, rng=r6,
                                    train=train)
        x_aa, x_ba = out_a[:n], out_a[n:]
        x_ab, x_bb = out_b[:n], out_b[n:]
        return x_aa, x_ba, x_ab, x_bb, shared

    def forward_a2b(self, params, x_a, rng=None, train=False):
        """A -> shared -> B (lsps_nets.py:260-265)."""
        r1, r2, r3, r4 = self._split(rng, 4)
        out = self.encode_A.apply(params["encode_A"], x_a, rng=r1,
                                  train=train)
        shared = self.enc_shared.apply(params["enc_shared"], out, rng=r2,
                                       train=train)
        out = self.dec_shared.apply(params["dec_shared"], shared, rng=r3,
                                    train=train)
        return self.decode_B.apply(params["decode_B"], out, rng=r4,
                                   train=train), shared

    def forward_b2a(self, params, x_b, rng=None, train=False):
        """B -> shared -> A (lsps_nets.py:267-272)."""
        r1, r2, r3, r4 = self._split(rng, 4)
        out = self.encode_B.apply(params["encode_B"], x_b, rng=r1,
                                  train=train)
        shared = self.enc_shared.apply(params["enc_shared"], out, rng=r2,
                                       train=train)
        out = self.dec_shared.apply(params["dec_shared"], shared, rng=r3,
                                    train=train)
        return self.decode_A.apply(params["decode_A"], out, rng=r4,
                                   train=train), shared


@register("model", "SharedResGen")
class SharedResGen(_SharedGenBase):
    """LeakyINSResBlock variant (lsps_nets.py:164-272)."""

    def _res_block(self, tch, dropout):
        return L.leaky_ins_res_block(tch, tch, dropout=dropout)


@register("model", "SharedResXGen")
class SharedResXGen(_SharedGenBase):
    """ResNeXt-block variant (lsps_nets.py:277-387)."""

    def __init__(self, cfg: dict):
        self._k = cfg.get("n_resnext_k", 1)
        self._c = cfg.get("n_resnext_c", 4)
        super().__init__(cfg)

    def _res_block(self, tch, dropout):
        return L.leaky_ins_resnext_block(tch, tch, k=self._k,
                                         cardinality=self._c,
                                         dropout=dropout)
