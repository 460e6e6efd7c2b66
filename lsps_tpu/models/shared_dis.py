"""Shared discriminator + posterior regressor.

Reference: src/trainers/lsps_nets.py:86-160 (``SharedDis``).  Per-domain
conv fronts (7x7 s2 + stride-2 convs), a shared trunk of stride-2 convs,
and two heads: ``D`` (1x1 conv real/fake logits) and ``Post`` (2x2 conv
-> posterior code).  ``regress_a``/``regress_b`` run the per-domain front
+ shared trunk + Post head — this is the deployed inference encoder
(src/depth_train.py:197-206).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lsps_tpu.ops import layers as L
from lsps_tpu.registry import register


def _front_net(ch, input_dim, n_layer):
    lays = [L.leaky_relu_conv2d(input_dim, ch, 7, 2, 3)]
    tch = ch
    for _ in range(1, n_layer):
        lays.append(L.leaky_relu_conv2d(tch, tch * 2, 3, 2, 1))
        tch *= 2
    return L.sequential(*lays), tch


@register("model", "SharedDis")
class SharedDis:
    def __init__(self, cfg: dict):
        self.cfg = dict(cfg)
        ch = cfg["ch"]
        n_front = cfg["n_front_layer"]
        n_expand = cfg.get("n_expand_layer", 0)
        n_shared = cfg["n_shared_layer"]
        self.post_dim = cfg["post_dim"]
        self.reg_dim = cfg["reg_dim"]

        self.model_A, tch = _front_net(ch, cfg["input_dim_a"], n_front)
        self.model_B, _ = _front_net(ch, cfg["input_dim_b"], n_front)

        shared = []
        for _ in range(n_expand):
            shared.append(L.leaky_relu_conv2d(tch, tch * 2, 3, 1, 1))
            tch *= 2
        for _ in range(n_shared):
            shared.append(L.leaky_relu_conv2d(tch, tch * 2, 3, 2, 1))
            tch *= 2
        self.model_S = L.sequential(*shared)
        self.D = L.conv2d(tch, 1, 1, 1, 0)           # lsps_nets.py:124
        self.Post = L.conv2d(tch, self.post_dim, 2, 1, 0)  # lsps_nets.py:123
        self.trunk_ch = tch

    def init(self, key):
        ks = jax.random.split(key, 5)
        return {
            "model_A": self.model_A.init(ks[0]),
            "model_B": self.model_B.init(ks[1]),
            "model_S": self.model_S.init(ks[2]),
            "D": self.D.init(ks[3]),
            "Post": self.Post.init(ks[4]),
        }

    # -- heads ---------------------------------------------------------------
    def _shared_feats(self, params, x):
        return self.model_S.apply(params["model_S"], x)

    def regress_a(self, params, x_a):
        """Posterior code from domain-A crop (lsps_nets.py:135-139).
        Returns (post, post, post) for API parity."""
        f = self._shared_feats(params,
                               self.model_A.apply(params["model_A"], x_a))
        post = self.Post.apply(params["Post"], f)
        post = post.reshape(post.shape[0], -1)
        return post, post, post

    def regress_b(self, params, x_b):
        """Posterior code from domain-B crop (lsps_nets.py:141-145)."""
        f = self._shared_feats(params,
                               self.model_B.apply(params["model_B"], x_b))
        post = self.Post.apply(params["Post"], f)
        post = post.reshape(post.shape[0], -1)
        return post, post, post

    def feats(self, params, x_aa, x_ba, x_ab, x_bb):
        """Shared-trunk feature taps for feature matching
        (lsps_nets.py:147-152). Returns 4 equal batch splits."""
        x_A = jnp.concatenate([x_aa, x_ba], axis=0)
        x_B = jnp.concatenate([x_ab, x_bb], axis=0)
        f = jnp.concatenate([
            self.model_A.apply(params["model_A"], x_A),
            self.model_B.apply(params["model_B"], x_B)], axis=0)
        f = self._shared_feats(params, f)
        n = f.shape[0] // 4
        return f[:n], f[n:2 * n], f[2 * n:3 * n], f[3 * n:]

    def __call__(self, params, x_A, x_B):
        """Joint discriminator pass (lsps_nets.py:154-160).
        Returns (out_D_A flat, out_D_B flat, feats_A, feats_B)."""
        f = jnp.concatenate([
            self.model_A.apply(params["model_A"], x_A),
            self.model_B.apply(params["model_B"], x_B)], axis=0)
        f = self._shared_feats(params, f)
        out_d = self.D.apply(params["D"], f)
        n = f.shape[0] // 2
        feats_a, feats_b = f[:n], f[n:]
        out_a, out_b = out_d[:n], out_d[n:]
        return out_a.reshape(-1), out_b.reshape(-1), feats_a, feats_b
