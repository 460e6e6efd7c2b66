"""Pose VAE over flattened 3D joint vectors.

Reference: src/trainers/lsps_nets.py:34-83 (``poseVAE``).
Encoder: Linear -> LeakyReLU -> (mu Linear, sd = softplus(Linear)), with
mu/sd heads preset to N(0, 0.002) (lsps_nets.py:55-59).  Reparameterized
sample uses fixed-scale noise N(0, 0.05) (lsps_nets.py:77).  Decoder:
LeakyReLU(Linear) -> Linear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsps_tpu.ops import layers as L
from lsps_tpu.registry import register

NOISE_STD = 0.05  # lsps_nets.py:77


def _preset_w(key, shape):
    return 0.002 * jax.random.normal(key, shape, jnp.float32)


@register("model", "poseVAE")
@register("model", "PoseVAE")
class PoseVAE:
    def __init__(self, params_cfg: dict):
        self.input_dim = params_cfg["input_dim"]
        self.z_dim = params_cfg["z_dim"]
        self.h_dim = params_cfg["h_dim"]
        self._en_fc1 = L.linear(self.input_dim, self.h_dim)
        self._en_mu = L.linear(self.h_dim, self.z_dim,
                               w_init=_preset_w, b_init=lambda k, s:
                               0.002 * jax.random.normal(k, s, jnp.float32))
        self._en_sigma = L.linear(self.h_dim, self.z_dim,
                                  w_init=_preset_w, b_init=lambda k, s:
                                  0.002 * jax.random.normal(k, s, jnp.float32))
        self._de_fc1 = L.leaky_relu_linear(self.z_dim, self.h_dim)
        self._de_fc2 = L.linear(self.h_dim, self.input_dim)

    def init(self, key):
        ks = jax.random.split(key, 5)
        return {
            "en_fc1": self._en_fc1.init(ks[0]),
            "en_mu": self._en_mu.init(ks[1]),
            "en_sigma": self._en_sigma.init(ks[2]),
            "de_fc1": self._de_fc1.init(ks[3]),
            "de_fc2": self._de_fc2.init(ks[4]),
        }

    def encode(self, params, y, rng=None):
        """Return (z, mu, sd). With rng, z is a reparameterized sample with
        fixed noise scale 0.05 (lsps_nets.py:73-78); without, z = mu."""
        h = L.leaky_relu(self._en_fc1.apply(params["en_fc1"], y))
        mu = self._en_mu.apply(params["en_mu"], h)
        sd = jax.nn.softplus(self._en_sigma.apply(params["en_sigma"], h))
        if rng is None:
            return mu, mu, sd
        noise = NOISE_STD * jax.random.normal(rng, mu.shape, mu.dtype)
        return mu + sd * noise, mu, sd

    def decode(self, params, z):
        h = self._de_fc1.apply(params["de_fc1"], z)
        return self._de_fc2.apply(params["de_fc2"], h)

    def __call__(self, params, y, rng=None):
        """Full pass: returns (recons, z, mu, sd) (lsps_nets.py:68-71)."""
        z, mu, sd = self.encode(params, y, rng)
        return self.decode(params, z), z, mu, sd
