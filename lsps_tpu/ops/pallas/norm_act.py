"""Pallas TPU kernels: fused InstanceNorm (+ optional LeakyReLU) with
custom VJP.

The generator's residual stack (SharedResGen, lsps_nets.py:164-272) runs
conv -> IN -> LeakyReLU -> conv -> IN in every block at 32x32xC.  XLA
fuses much of this, but the pattern reads the activation twice (mean,
then var) before the normalize(+activation) pass; these kernels compute
the moments and the normalized activation in one VMEM residency per
(batch, H*W, C) plane, and the custom backward reuses saved (xhat, rstd)
instead of recomputing moments.  Both INs of the block are covered:
``fused_instance_norm_leaky_relu`` (IN + LeakyReLU) and
``fused_instance_norm`` (the block's second, activation-free IN — on the
profile this was the largest non-conv cost, a convert+reduce fusion pair
per block per pass).

Layout: input NHWC reshaped to (B, H*W, C); grid over B; one program
normalizes a full (H*W, C) plane held in VMEM (32*32*256 fp32 = 1 MB,
well under the ~16 MB VMEM budget; 128*128*64 = 4 MB also fits).

Falls back to the pure-jnp implementation when disabled (CPU tests) via
``set_pallas_enabled``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ENABLED = None  # None = auto (TPU only)
_INTERPRET = False  # tests: run pallas kernels in interpreter mode


def set_pallas_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)


def set_pallas_enabled(value) -> None:
    """True/False force, None = auto-detect (enabled on TPU)."""
    global _ENABLED
    _ENABLED = value


def pallas_enabled() -> bool:
    if _ENABLED is not None:
        return _ENABLED
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


EPS = 1e-5
SLOPE = 0.01  # torch LeakyReLU default


def _act(xhat, slope):
    """LeakyReLU with static slope; slope=None -> identity."""
    if slope is None:
        return xhat
    return jnp.where(xhat >= 0, xhat, slope * xhat)


def _act_grad(g, xhat, slope):
    if slope is None:
        return g
    return jnp.where(xhat >= 0, g, slope * g)


# ---------------------------------------------------------------------------
# reference (pure jnp) path
# ---------------------------------------------------------------------------

def _jnp_fwd(x, slope):
    # moments in f32 (bf16 accumulation over H*W pixels is unusable);
    # xhat/rstd residuals stay f32 for the backward, y returns to x.dtype.
    # promote_types keeps f64 inputs in f64 (the float64 oracle-parity
    # path; the Pallas kernels are f32-moment and TPU-only).
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + EPS)
    xhat = (xf - mean) * rstd
    y = _act(xhat, slope).astype(x.dtype)
    return y, xhat, rstd


# ---------------------------------------------------------------------------
# pallas kernels
# ---------------------------------------------------------------------------

def _pallas_fwd(x, slope):
    from jax.experimental import pallas as pl

    b, hw, c = x.shape
    out_shapes = (
        jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        jax.ShapeDtypeStruct((b, hw, c), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
    )
    spec = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0))

    def kernel(x_ref, y_ref, xhat_ref, rstd_ref):
        # moments in f32 (bf16-safe); y returns to the input dtype
        x = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
        rstd = jax.lax.rsqrt(var + EPS)
        xhat = (x - mean) * rstd
        y_ref[0] = _act(xhat, slope).astype(y_ref.dtype)
        xhat_ref[0] = xhat
        rstd_ref[0] = rstd

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec],
        out_specs=(spec, spec, pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0))),
        out_shape=out_shapes,
        interpret=_INTERPRET,
    )(x)


def _pallas_bwd(g, xhat, rstd, slope):
    from jax.experimental import pallas as pl

    b, hw, c = g.shape
    spec = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0))
    rspec = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0))

    def kernel(g_ref, xhat_ref, rstd_ref, dx_ref):
        g = g_ref[0].astype(jnp.float32)
        xhat = xhat_ref[0]
        rstd = rstd_ref[0]
        gp = _act_grad(g, xhat, slope)
        m1 = jnp.mean(gp, axis=0, keepdims=True)
        m2 = jnp.mean(gp * xhat, axis=0, keepdims=True)
        dx_ref[0] = (rstd * (gp - m1 - xhat * m2)).astype(dx_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec, spec, rspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, hw, c), g.dtype),
        interpret=_INTERPRET,
    )(g, xhat, rstd)


# ---------------------------------------------------------------------------
# public ops with custom VJP (NHWC)
# ---------------------------------------------------------------------------

def _fwd_impl(x, slope):
    b, h, w, c = x.shape
    xr = x.reshape(b, h * w, c)
    if pallas_enabled():
        y, xhat, rstd = _pallas_fwd(xr, slope)
    else:
        y, xhat, rstd = _jnp_fwd(xr, slope)
    return y.reshape(b, h, w, c), xhat, rstd


def _bwd_impl(g, xhat, rstd, shape, slope):
    b, h, w, c = shape
    gr = g.reshape(b, h * w, c)
    if pallas_enabled():
        dx = _pallas_bwd(gr, xhat, rstd, slope)
    else:
        # promote, don't truncate: an f64 cotangent (the x64 lockstep
        # oracle) must stay f64 — casting to f32 here injected ~1e-7
        # noise into the analytically-zero conv-bias gradient, which
        # Adam then amplified to a 2% parameter drift over 6 steps
        gp = _act_grad(gr.astype(jnp.promote_types(gr.dtype,
                                                   jnp.float32)),
                       xhat, slope)
        m1 = jnp.mean(gp, axis=1, keepdims=True)
        m2 = jnp.mean(gp * xhat, axis=1, keepdims=True)
        dx = (rstd * (gp - m1 - xhat * m2)).astype(gr.dtype)
    return dx.reshape(shape)


@jax.custom_vjp
def fused_instance_norm_leaky_relu(x):
    """LeakyReLU(InstanceNorm(x)) on NHWC, fused on TPU via Pallas."""
    y, _, _ = _fwd_impl(x, SLOPE)
    return y


def _lrelu_vjp_fwd(x):
    y, xhat, rstd = _fwd_impl(x, SLOPE)
    return y, (xhat, rstd, x.shape)


def _lrelu_vjp_bwd(res, g):
    xhat, rstd, shape = res
    return (_bwd_impl(g, xhat, rstd, shape, SLOPE),)


fused_instance_norm_leaky_relu.defvjp(_lrelu_vjp_fwd, _lrelu_vjp_bwd)


@jax.custom_vjp
def fused_instance_norm(x):
    """InstanceNorm(x) (no activation) on NHWC, fused on TPU via Pallas —
    the residual block's second norm (common_net.py:160-181 last IN)."""
    y, _, _ = _fwd_impl(x, None)
    return y


def _in_vjp_fwd(x):
    y, xhat, rstd = _fwd_impl(x, None)
    return y, (xhat, rstd, x.shape)


def _in_vjp_bwd(res, g):
    xhat, rstd, shape = res
    return (_bwd_impl(g, xhat, rstd, shape, None),)


fused_instance_norm.defvjp(_in_vjp_fwd, _in_vjp_bwd)


# ---------------------------------------------------------------------------
# block-level kernel: InstanceNorm + residual add (round-3 MFU attack)
# ---------------------------------------------------------------------------
# The round-2 attempt replaced ONLY the block's second IN and lost 1.5x:
# saving an f32 xhat residual for the backward doubled the HBM traffic
# and broke XLA's fusion across the residual add.  This kernel moves the
# BOUNDARY instead: it computes IN(x) + res in one VMEM residency and
# saves (x, mean, rstd) — x is the conv output in the compute dtype
# (bf16 in mixed-precision mode, half the bytes of an f32 xhat) and the
# backward recomputes xhat on the fly from the tiny per-channel moments.
# dres is the cotangent unchanged (the residual add backward is
# identity), so no extra pass materializes.

_IN_RES_FUSED = None  # None = off (opt-in until measured faster on TPU)


def set_in_res_fused(value) -> None:
    """True/False force; None = default (off)."""
    global _IN_RES_FUSED
    _IN_RES_FUSED = value


def in_res_fused_enabled() -> bool:
    """Whether LeakyINSResBlock routes its tail through the fused
    IN+residual op (set_in_res_fused / LSPS_FUSED_IN_RES=1).  The math
    is identical either way (pinned by tests); this only moves the
    XLA/Pallas boundary."""
    if _IN_RES_FUSED is not None:
        return bool(_IN_RES_FUSED)
    import os

    return os.environ.get("LSPS_FUSED_IN_RES", "0") == "1"


def _in_res_fwd_impl(x, res):
    b, h, w, c = x.shape
    xr = x.reshape(b, h * w, c)
    rr = res.reshape(b, h * w, c)
    if pallas_enabled():
        y, mean, rstd = _pallas_in_res_fwd(xr, rr)
    else:
        ft = jnp.promote_types(xr.dtype, jnp.float32)  # keep f64 f64
        xf = xr.astype(ft)
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
        rstd = jax.lax.rsqrt(var + EPS)
        xhat = (xf - mean) * rstd
        y = (xhat + rr.astype(ft)).astype(res.dtype)
    return y.reshape(res.shape), mean, rstd


def _pallas_in_res_fwd(x, res):
    from jax.experimental import pallas as pl

    b, hw, c = x.shape
    spec = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0))
    rspec = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0))

    def kernel(x_ref, res_ref, y_ref, mean_ref, rstd_ref):
        xf = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(xf, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=0, keepdims=True)
        rstd = jax.lax.rsqrt(var + EPS)
        xhat = (xf - mean) * rstd
        y_ref[0] = (xhat + res_ref[0].astype(jnp.float32)).astype(
            y_ref.dtype)
        mean_ref[0] = mean
        rstd_ref[0] = rstd

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec, spec],
        out_specs=(spec, rspec, rspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, hw, c), res.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(x, res)


def _pallas_in_res_bwd(g, x, mean, rstd):
    from jax.experimental import pallas as pl

    b, hw, c = g.shape
    spec = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0))
    rspec = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0))

    def kernel(g_ref, x_ref, mean_ref, rstd_ref, dx_ref):
        gf = g_ref[0].astype(jnp.float32)
        xf = x_ref[0].astype(jnp.float32)
        rstd = rstd_ref[0]
        xhat = (xf - mean_ref[0]) * rstd  # recomputed, not saved
        m1 = jnp.mean(gf, axis=0, keepdims=True)
        m2 = jnp.mean(gf * xhat, axis=0, keepdims=True)
        dx_ref[0] = (rstd * (gf - m1 - xhat * m2)).astype(dx_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec, spec, rspec, rspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, hw, c), g.dtype),
        interpret=_INTERPRET,
    )(g, x, mean, rstd)


@jax.custom_vjp
def fused_instance_norm_residual(x, res):
    """InstanceNorm(x) + res on NHWC — the tail of LeakyINSResBlock
    (common_net.py:160-181: second conv's IN plus the residual add) as
    one fused op."""
    y, _, _ = _in_res_fwd_impl(x, res)
    return y


def _in_res_vjp_fwd(x, res):
    y, mean, rstd = _in_res_fwd_impl(x, res)
    return y, (x, mean, rstd)


def _in_res_vjp_bwd(saved, g):
    x, mean, rstd = saved
    b, h, w, c = x.shape
    gr = g.reshape(b, h * w, c)
    if pallas_enabled():
        dx = _pallas_in_res_bwd(gr, x.reshape(b, h * w, c), mean, rstd)
    else:
        ft = jnp.promote_types(gr.dtype, jnp.float32)  # keep f64 f64
        gf = gr.astype(ft)
        xf = x.reshape(b, h * w, c).astype(ft)
        xhat = (xf - mean) * rstd
        m1 = jnp.mean(gf, axis=1, keepdims=True)
        m2 = jnp.mean(gf * xhat, axis=1, keepdims=True)
        dx = (rstd * (gf - m1 - xhat * m2)).astype(gr.dtype)
    return dx.reshape(x.shape), g


fused_instance_norm_residual.defvjp(_in_res_vjp_fwd, _in_res_vjp_bwd)
