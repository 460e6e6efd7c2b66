"""Functional NN building blocks (NHWC, TPU-native).

This is the TPU-first re-design of the reference's ~20 nn.Module wrappers
(reference: src/trainers/common_net.py:111-379).  Models are parameter
pytrees; every layer is an (init, apply) pair and composition is a plain
Python list — everything traces to one XLA program under jit.

Layout: activations NHWC, conv kernels HWIO (XLA-preferred on TPU, feeds
the MXU without transposes).  PyTorch semantic parity is kept where it
affects numerics:

* ``Conv2d``            -> ``conv2d``           (cross-correlation, bias)
* ``ConvTranspose2d``   -> ``conv2d_transpose`` (incl. ``output_padding``)
* ``InstanceNorm2d``    -> ``instance_norm``    (affine=False, eps=1e-5,
                                                 biased variance)
* ``LeakyReLU``         -> slope 0.01 (torch default)
* ``GaussianNoiseLayer``-> additive N(0,1), train only
                           (common_net.py:32-40)
* weight init           -> N(0, 0.02) conv weights
                           (src/trainers/init.py:8-12), torch-default
                           uniform elsewhere

apply signature: ``apply(params, x, rng=None, train=False)``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Layer(NamedTuple):
    init: Callable[[jax.Array], Any]
    apply: Callable[..., jax.Array]


# ---------------------------------------------------------------------------
# initializers (PyTorch-parity distributions)
# ---------------------------------------------------------------------------

def _torch_uniform_bound(fan_in: int) -> float:
    return 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0


def gaussian_conv_init(key, shape, std=0.02):
    """N(0, 0.02) — the reference's gaussian_weights_init (init.py:8-12)."""
    return std * jax.random.normal(key, shape, jnp.float32)


def torch_uniform_init(key, shape, fan_in):
    b = _torch_uniform_bound(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -b, b)


# ---------------------------------------------------------------------------
# conv / linear primitives
# ---------------------------------------------------------------------------

_DIMSPEC = ("NHWC", "HWIO", "NHWC")

# im2col reformulation of C_in=1 stem convs (opt-in): a 7x7 single-
# channel conv gives the MXU a K=1-deep contraction per tap; extracting
# the 49 taps into the feature dimension first
# (lax.conv_general_dilated_patches) turns it into one K=49 GEMM —
# math-identical, measured by scripts/bench_im2col.py (VERDICT r3 #5:
# the last untested escape hatch of the MFU roofline argument).
_IM2COL_STEM = None  # None = env default (LSPS_IM2COL_STEM=1)


def set_im2col_stem(value) -> None:
    """True/False force, None = env default."""
    global _IM2COL_STEM
    _IM2COL_STEM = value


def im2col_stem_enabled() -> bool:
    if _IM2COL_STEM is not None:
        return bool(_IM2COL_STEM)
    import os

    return os.environ.get("LSPS_IM2COL_STEM", "0") == "1"


def _patches_gemm(x, w, stride: int, padding: int):
    """C_in=1 conv as patch-extraction + GEMM.  With one input channel
    the patches helper's feature ordering is plain row-major (kh, kw),
    matching HWIO kernel reshape; pinned by tests against the conv."""
    kh, kw, ci, co = w.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=_DIMSPEC)
    y = jnp.dot(patches, w.reshape(kh * kw * ci, co),
                preferred_element_type=jnp.promote_types(x.dtype,
                                                         jnp.float32))
    # back to the conv path's output dtype (bf16 conv also accumulates
    # f32 internally and emits bf16)
    return y.astype(x.dtype)


def conv2d(n_in: int, n_out: int, kernel_size: int, stride: int = 1,
           padding: int = 0, groups: int = 1, bias: bool = True,
           w_init=None) -> Layer:
    """PyTorch-parity Conv2d. Kernel stored HWIO: (kh, kw, in/groups, out)."""
    k = kernel_size

    def init(key):
        kw_, kb_ = jax.random.split(key)
        shape = (k, k, n_in // groups, n_out)
        if w_init is None:
            w = gaussian_conv_init(kw_, shape)
        else:
            w = w_init(kw_, shape)
        p = {"w": w}
        if bias:
            fan_in = (n_in // groups) * k * k
            p["b"] = torch_uniform_init(kb_, (n_out,), fan_in)
        return p

    def apply(params, x, rng=None, train=False):
        if groups == 1 and n_in == 1 and k > 1 and im2col_stem_enabled():
            y = _patches_gemm(x, params["w"], stride, padding)
        else:
            y = jax.lax.conv_general_dilated(
                x, params["w"], window_strides=(stride, stride),
                padding=[(padding, padding), (padding, padding)],
                dimension_numbers=_DIMSPEC, feature_group_count=groups,
            )
        if bias:
            y = y + params["b"]
        return y

    return Layer(init, apply)


def conv2d_transpose(n_in: int, n_out: int, kernel_size: int,
                     stride: int = 1, padding: int = 0,
                     output_padding: int = 0, bias: bool = True,
                     w_init=None) -> Layer:
    """PyTorch-parity ConvTranspose2d.

    Implemented as an input-dilated convolution with a spatially-flipped
    kernel: out = (in-1)*s - 2p + k + output_padding, identical to torch.
    Kernel stored HWIO with I=n_in, O=n_out (flip applied at call time so
    checkpoint conversion from torch is a pure transpose).
    """
    k = kernel_size
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding

    def init(key):
        kw_, kb_ = jax.random.split(key)
        shape = (k, k, n_in, n_out)
        if w_init is None:
            w = gaussian_conv_init(kw_, shape)
        else:
            w = w_init(kw_, shape)
        p = {"wt": w}  # "wt" marks transposed-conv weights for converters
        if bias:
            # torch fan_in for ConvTranspose2d weight (in,out,kh,kw): out*k*k
            p["b"] = torch_uniform_init(kb_, (n_out,), n_out * k * k)
        return p

    def apply(params, x, rng=None, train=False):
        if k == 1 and stride == 1 and padding == 0 and output_padding == 0:
            # 1x1 stride-1 convT == per-pixel channel contraction; a dot
            # gives XLA a friendlier graph than a 1-output-channel conv
            y = jnp.tensordot(x, params["wt"][0, 0], axes=[[3], [0]])
        else:
            w = jnp.flip(params["wt"], (0, 1))
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1),
                padding=[(pad_lo, pad_hi), (pad_lo, pad_hi)],
                lhs_dilation=(stride, stride),
                dimension_numbers=_DIMSPEC,
            )
        if bias:
            y = y + params["b"]
        return y

    return Layer(init, apply)


def linear(n_in: int, n_out: int, bias: bool = True, w_init=None,
           b_init=None) -> Layer:
    """PyTorch-parity Linear; weight stored (in, out)."""

    def init(key):
        kw_, kb_ = jax.random.split(key)
        if w_init is None:
            w = torch_uniform_init(kw_, (n_in, n_out), n_in)
        else:
            w = w_init(kw_, (n_in, n_out))
        p = {"w": w}
        if bias:
            if b_init is None:
                p["b"] = torch_uniform_init(kb_, (n_out,), n_in)
            else:
                p["b"] = b_init(kb_, (n_out,))
        return p

    def apply(params, x, rng=None, train=False):
        y = jnp.dot(x, params["w"],
                    preferred_element_type=jnp.promote_types(x.dtype,
                                                             jnp.float32))
        if bias:
            y = y + params["b"]
        return y

    return Layer(init, apply)


# ---------------------------------------------------------------------------
# norms / activations / noise
# ---------------------------------------------------------------------------

def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d(affine=False) on NHWC: normalize each (n, c) plane
    over H, W with biased variance (torch parity).  Moments accumulate
    in f32 even under bf16 compute (a bf16 mean over 16k pixels is
    unusable); output returns to the input dtype."""
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def instance_norm_layer(eps: float = 1e-5) -> Layer:
    return Layer(lambda key: {},
                 lambda p, x, rng=None, train=False: instance_norm(x, eps))


def leaky_relu(x, slope: float = 0.01):
    return jnp.where(x >= 0, x, slope * x)


def leaky_relu_layer(slope: float = 0.01) -> Layer:
    return Layer(lambda key: {},
                 lambda p, x, rng=None, train=False: leaky_relu(x, slope))


def relu_layer() -> Layer:
    return Layer(lambda key: {},
                 lambda p, x, rng=None, train=False: jnp.maximum(x, 0))


def tanh_layer() -> Layer:
    return Layer(lambda key: {},
                 lambda p, x, rng=None, train=False: jnp.tanh(x))


def gaussian_noise_layer() -> Layer:
    """Additive unit gaussian noise, active only in training
    (reference common_net.py:32-40)."""

    def apply(p, x, rng=None, train=False):
        if not train:
            return x
        if rng is None:
            raise ValueError("gaussian_noise_layer needs rng when train=True")
        return x + jax.random.normal(rng, x.shape, x.dtype)

    return Layer(lambda key: {}, apply)


def dropout_layer(rate: float) -> Layer:
    def apply(p, x, rng=None, train=False):
        if not train or rate <= 0.0:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)

    return Layer(lambda key: {}, apply)


# ---------------------------------------------------------------------------
# composition
# ---------------------------------------------------------------------------

def sequential(*layers: Layer) -> Layer:
    """Compose layers; params is a list. RNG is split per layer."""
    layers = tuple(layers)

    def init(key):
        keys = jax.random.split(key, max(len(layers), 1))
        return [l.init(k) for l, k in zip(layers, keys)]

    def apply(params, x, rng=None, train=False):
        rngs = (jax.random.split(rng, len(layers)) if rng is not None
                else [None] * len(layers))
        for l, p, r in zip(layers, params, rngs):
            x = l.apply(p, x, rng=r, train=train)
        return x

    return Layer(init, apply)


def residual(body: Layer) -> Layer:
    def init(key):
        return body.init(key)

    def apply(params, x, rng=None, train=False):
        return x + body.apply(params, x, rng=rng, train=train)

    return Layer(init, apply)


# ---------------------------------------------------------------------------
# reference composite blocks (common_net.py)
# ---------------------------------------------------------------------------

def leaky_relu_conv2d(n_in, n_out, kernel_size, stride, padding=0) -> Layer:
    """LeakyReLUConv2d (common_net.py:246-256)."""
    return sequential(conv2d(n_in, n_out, kernel_size, stride, padding),
                      leaky_relu_layer())


def leaky_relu_conv_transpose2d(n_in, n_out, kernel_size, stride, padding=0,
                                output_padding=0) -> Layer:
    """LeakyReLUConvTranspose2d (common_net.py:258-268)."""
    return sequential(
        conv2d_transpose(n_in, n_out, kernel_size, stride, padding,
                         output_padding),
        leaky_relu_layer())


def leaky_relu_linear(n_in, n_out) -> Layer:
    """LeakyReLULinear (common_net.py:221-231)."""
    return sequential(linear(n_in, n_out), leaky_relu_layer())


def fused_in_lrelu_layer() -> Layer:
    """InstanceNorm + LeakyReLU as one op — Pallas kernel on TPU
    (ops/pallas/norm_act.py), mathematically identical to the
    instance_norm_layer + leaky_relu_layer pair."""
    from lsps_tpu.ops.pallas.norm_act import fused_instance_norm_leaky_relu

    return Layer(lambda key: {},
                 lambda p, x, rng=None, train=False:
                 fused_instance_norm_leaky_relu(x))


def fused_in_layer() -> Layer:
    """InstanceNorm (no activation) as one Pallas op on TPU — single
    VMEM residency + saved-moment backward, identical math to
    instance_norm_layer.

    Bench/experiment-only: no shipped model uses it.  As a standalone
    second-IN replacement inside leaky_ins_res_block it measured 1.5x
    slower end-to-end (forces an f32 xhat residual, breaks XLA's fusion
    across the residual add — docs/BENCHMARKS.md round-2 notes); the
    block keeps the XLA-composed norm."""
    from lsps_tpu.ops.pallas.norm_act import fused_instance_norm

    return Layer(lambda key: {},
                 lambda p, x, rng=None, train=False:
                 fused_instance_norm(x))


def leaky_ins_res_block(n_in, n_out, dropout: float = 0.0) -> Layer:
    """LeakyINSResBlock (common_net.py:160-181): two 3x3 convs with
    InstanceNorm, LeakyReLU between, residual add.  The IN+LeakyReLU
    pair is fused (Pallas on TPU); param tree keeps a placeholder slot
    so checkpoints stay layout-compatible with the unfused form.

    The block's second (activation-free) IN defaults to the XLA-composed
    form: a norm-only Pallas kernel there measured 1.5x SLOWER (forced
    f32 xhat residual + broken fusion across the residual add —
    docs/BENCHMARKS.md round-2 notes).  ``LSPS_FUSED_IN_RES=1`` (or
    ``norm_act.set_in_res_fused(True)``) instead routes the tail through
    ``fused_instance_norm_residual`` — IN + residual add in ONE kernel,
    saving (x, mean, rstd) rather than an f32 xhat — the round-3 retry
    that moves the kernel boundary instead of fighting it.  Measured:
    ALSO loses (113.6 vs 106.9 ms at bf16 batch 32 — the custom-VJP
    boundary blocks conv-epilogue fusion on both sides; see
    docs/BENCHMARKS.md round-3 notes), so the default stays
    XLA-composed and the kernel is a library/bench op.  Identical
    math either way; param layout unchanged."""
    body = [
        conv2d(n_in, n_out, 3, 1, 1),
        fused_in_lrelu_layer(),
        noop_layer(),  # placeholder: keeps 5-slot layout (conv,IN,act,conv,IN)
        conv2d(n_out, n_out, 3, 1, 1),
        instance_norm_layer(),
    ]
    if dropout > 0:
        body.append(dropout_layer(dropout))
        return residual(sequential(*body))
    seq = sequential(*body)

    def apply(params, x, rng=None, train=False):
        from lsps_tpu.ops.pallas import norm_act

        if not norm_act.in_res_fused_enabled():
            return x + seq.apply(params, x, rng=rng, train=train)
        # none of conv/IN/act consume rng, so rng=None is value-identical
        h = x
        for lay, p in zip(body[:4], params[:4]):
            h = lay.apply(p, h, rng=None, train=train)
        return norm_act.fused_instance_norm_residual(h, x)

    return Layer(seq.init, apply)


def noop_layer() -> Layer:
    return Layer(lambda key: {},
                 lambda p, x, rng=None, train=False: x)


def ins_res_block(n_in, n_out, dropout: float = 0.0) -> Layer:
    """INSResBlock (common_net.py:137-158) — ReLU variant."""
    body = [
        conv2d(n_in, n_out, 3, 1, 1),
        instance_norm_layer(),
        relu_layer(),
        conv2d(n_out, n_out, 3, 1, 1),
        instance_norm_layer(),
    ]
    if dropout > 0:
        body.append(dropout_layer(dropout))
    return residual(sequential(*body))


def leaky_ins_resnext_block(n_in, n_out, k: int = 2, cardinality: int = 8,
                            dropout: float = 0.0) -> Layer:
    """LeakyINSResNeXtBlock (common_net.py:111-132): 1x1 expand -> grouped
    3x3 -> 1x1 project, IN + LeakyReLU, residual add."""
    mid = k * n_in
    body = [
        conv2d(n_in, mid, 1, 1, 0),
        instance_norm_layer(),
        leaky_relu_layer(),
        conv2d(mid, mid, 3, 1, 1, groups=cardinality),
        instance_norm_layer(),
        leaky_relu_layer(),
        conv2d(mid, n_out, 1, 1, 0),
        instance_norm_layer(),
    ]
    if dropout > 0:
        body.append(dropout_layer(dropout))
    return residual(sequential(*body))


# ---------------------------------------------------------------------------
# misc heads used by models
# ---------------------------------------------------------------------------

def softplus(x):
    return jax.nn.softplus(x)


# ---------------------------------------------------------------------------
# remaining common_net library blocks (reference common_net.py:12-103,
# 183-379).  These are not instantiated by the shipped configs (SURVEY.md
# §2.9) but belong to the reference's reusable block library; kept here so
# the op library is complete.  BatchNorm notes: the reference's BN blocks
# are dead code that was only ever run in training mode, so the
# functional equivalents use batch statistics (no running-average state).
# ---------------------------------------------------------------------------

def _gaussian_kernel_1d(kernel_size: int) -> np.ndarray:
    """cv2.getGaussianKernel(k, -1) parity: the fixed small-kernel tables
    for k <= 7, else sigma = 0.3*((k-1)*0.5 - 1) + 0.8."""
    small = {
        1: [1.0],
        3: [0.25, 0.5, 0.25],
        5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
        7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375,
            0.03125],
    }
    if kernel_size in small:
        return np.asarray(small[kernel_size], np.float64)
    sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_smoother(kernel_size: int = 5) -> Layer:
    """GaussianSmoother (common_net.py:12-30): fixed (non-trainable)
    Gaussian blur over each channel with replicate padding."""
    k1 = _gaussian_kernel_1d(kernel_size)
    k2 = np.outer(k1, k1).astype(np.float32)
    pad = (kernel_size - 1) // 2

    def apply(params, x, rng=None, train=False):
        c = x.shape[-1]
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="edge")
        w = jnp.asarray(k2)[:, :, None, None] * jnp.eye(c)[None, None]
        return jax.lax.conv_general_dilated(
            xp, w, window_strides=(1, 1), padding="VALID",
            dimension_numbers=_DIMSPEC)

    return Layer(lambda key: {}, apply)


def _preset_normal_init(key, shape, std=0.002):
    return std * jax.random.normal(key, shape, jnp.float32)


class GaussianVAEHead:
    """GaussianVAE (common_net.py:42-64): paired mu / softplus-sd linear
    heads preset to N(0, 0.002).  ``apply`` -> (mu, sd);
    ``sample`` -> (mu + sd*noise, mu, sd)."""

    def __init__(self, n_in, n_out):
        self.en_mu = linear(n_in, n_out, w_init=_preset_normal_init,
                            b_init=_preset_normal_init)
        self.en_sigma = linear(n_in, n_out, w_init=_preset_normal_init,
                               b_init=_preset_normal_init)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"en_mu": self.en_mu.init(k1),
                "en_sigma": self.en_sigma.init(k2)}

    def apply(self, params, x):
        mu = self.en_mu.apply(params["en_mu"], x)
        sd = jax.nn.softplus(self.en_sigma.apply(params["en_sigma"], x))
        return mu, sd

    def sample(self, params, x, rng):
        mu, sd = self.apply(params, x)
        noise = jax.random.normal(rng, mu.shape, mu.dtype)
        return mu + sd * noise, mu, sd


class GaussianVAE2DHead:
    """GaussianVAE2D (common_net.py:66-90): conv mu / softplus-sd heads
    preset to N(0, 0.002)."""

    def __init__(self, n_in, n_out, kernel_size, stride, padding=0):
        self.en_mu = conv2d(n_in, n_out, kernel_size, stride, padding,
                            w_init=_preset_normal_init)
        self.en_sigma = conv2d(n_in, n_out, kernel_size, stride, padding,
                               w_init=_preset_normal_init)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"en_mu": self.en_mu.init(k1),
                "en_sigma": self.en_sigma.init(k2)}

    def apply(self, params, x):
        mu = self.en_mu.apply(params["en_mu"], x)
        sd = jax.nn.softplus(self.en_sigma.apply(params["en_sigma"], x))
        return mu, sd

    def sample(self, params, x, rng):
        mu, sd = self.apply(params, x)
        noise = jax.random.normal(rng, mu.shape, mu.dtype)
        return mu + sd * noise, mu, sd


def bias2d(channels: int) -> Layer:
    """Bias2d (common_net.py:92-103): learnable per-channel bias preset
    N(0, 0.002), broadcast over NHW."""
    return Layer(
        lambda key: {"b": _preset_normal_init(key, (channels,))},
        lambda p, x, rng=None, train=False: x + p["b"])


def batch_norm_layer(n_out: int, affine: bool = True,
                     eps: float = 1e-5) -> Layer:
    """BatchNorm over (N, H, W) per channel using batch statistics
    (train-mode semantics; see module note).  Works for NHWC (4D) and
    NC (2D, BatchNorm1d-style) inputs."""

    def init(key):
        if not affine:
            return {}
        return {"scale": jnp.ones((n_out,), jnp.float32),
                "shift": jnp.zeros((n_out,), jnp.float32)}

    def apply(params, x, rng=None, train=False):
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        if affine:
            y = y * params["scale"] + params["shift"]
        return y.astype(x.dtype)

    return Layer(init, apply)


def leaky_relu_ins_conv2d(n_in, n_out, kernel_size, stride,
                          padding=0) -> Layer:
    """LeakyReLUINSConv2d (common_net.py:357-367)."""
    return sequential(conv2d(n_in, n_out, kernel_size, stride, padding),
                      instance_norm_layer(), leaky_relu_layer())


def leaky_relu_ins_conv_transpose2d(n_in, n_out, kernel_size, stride,
                                    padding=0, output_padding=0) -> Layer:
    """LeakyReLUINSConvTranspose2d (common_net.py:369-379)."""
    return sequential(
        conv2d_transpose(n_in, n_out, kernel_size, stride, padding,
                         output_padding),
        instance_norm_layer(), leaky_relu_layer())


def relu_ins_conv2d(n_in, n_out, kernel_size, stride, padding=0) -> Layer:
    """ReLUINSConv2d (common_net.py:385-395 region)."""
    return sequential(conv2d(n_in, n_out, kernel_size, stride, padding),
                      instance_norm_layer(), relu_layer())


def relu_ins_conv_transpose2d(n_in, n_out, kernel_size, stride, padding=0,
                              output_padding=0) -> Layer:
    """ReLUINSConvTranspose2d."""
    return sequential(
        conv2d_transpose(n_in, n_out, kernel_size, stride, padding,
                         output_padding),
        instance_norm_layer(), relu_layer())


def leaky_relu_bn_conv2d(n_in, n_out, kernel_size, stride,
                         padding=0) -> Layer:
    """LeakyReLUBNConv2d (common_net.py:294-305): conv (no bias) + BN
    (affine) + LeakyReLU."""
    return sequential(
        conv2d(n_in, n_out, kernel_size, stride, padding, bias=False),
        batch_norm_layer(n_out, affine=True), leaky_relu_layer())


def leaky_relu_bn_conv_transpose2d(n_in, n_out, kernel_size, stride,
                                   padding=0, output_padding=0) -> Layer:
    """LeakyReLUBNConvTranspose2d (common_net.py:307-318)."""
    return sequential(
        conv2d_transpose(n_in, n_out, kernel_size, stride, padding,
                         output_padding, bias=False),
        batch_norm_layer(n_out, affine=True), leaky_relu_layer())


def leaky_relu_bnns_conv2d(n_in, n_out, kernel_size, stride,
                           padding=0) -> Layer:
    """LeakyReLUBNNSConv2d (common_net.py:320-331): conv + BN(affine=False)
    + Bias2d + LeakyReLU."""
    return sequential(
        conv2d(n_in, n_out, kernel_size, stride, padding),
        batch_norm_layer(n_out, affine=False), bias2d(n_out),
        leaky_relu_layer())


def leaky_relu_bnns_conv_transpose2d(n_in, n_out, kernel_size, stride,
                                     padding=0) -> Layer:
    """LeakyReLUBNNSConvTranspose2d (common_net.py:333-344)."""
    return sequential(
        conv2d_transpose(n_in, n_out, kernel_size, stride, padding),
        batch_norm_layer(n_out, affine=False), bias2d(n_out),
        leaky_relu_layer())


def leaky_relu_bn_linear(n_in, n_out) -> Layer:
    """LeakyReLUBNLinear (common_net.py:282-292)."""
    return sequential(linear(n_in, n_out),
                      batch_norm_layer(n_out, affine=False),
                      leaky_relu_layer())


def leaky_relu_res_block(n_in, n_out, kernel_size, stride,
                         padding=0) -> Layer:
    """LeakyReLUResBlock (common_net.py:199-213): conv + LeakyReLU +
    conv, residual add.  The second conv takes (n_in, n_out) exactly
    like the reference's — only n_in == n_out is usable in either
    framework (the residual add requires it), so the shapes are kept
    reference-identical for checkpoint parity."""
    return residual(sequential(
        conv2d(n_in, n_out, kernel_size, stride, padding),
        leaky_relu_layer(),
        conv2d(n_in, n_out, kernel_size, stride, padding)))


def leaky_relu_bnns_res_block(n_in, n_out, kernel_size, stride,
                              padding=0) -> Layer:
    """LeakyReLUBNNSResBlock (common_net.py:183-197): two biasless convs
    with affine-free BN, LeakyReLU between, residual add.  Second conv
    is (n_in, n_out) exactly like the reference (see
    leaky_relu_res_block note)."""
    return residual(sequential(
        conv2d(n_in, n_out, kernel_size, stride, padding, bias=False),
        batch_norm_layer(n_out, affine=False), leaky_relu_layer(),
        conv2d(n_in, n_out, kernel_size, stride, padding, bias=False),
        batch_norm_layer(n_out, affine=False)))
