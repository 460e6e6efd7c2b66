"""im2col stem reformulation (ops/layers.set_im2col_stem): the C_in=1
conv as patches+GEMM must be mathematically identical to the conv
lowering — it exists purely to A/B the MXU utilization of the entry
convs (scripts/bench_im2col.py; MFU roofline, docs/BENCHMARKS.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsps_tpu.ops import layers


@pytest.fixture(autouse=True)
def _reset_flag():
    yield
    layers.set_im2col_stem(None)


@pytest.mark.parametrize("k,stride,padding", [(7, 1, 3), (3, 2, 1),
                                              (5, 2, 2)])
def test_im2col_matches_conv_fwd_and_grad(k, stride, padding):
    lay = layers.conv2d(1, 8, k, stride, padding)
    params = lay.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 1),
                    jnp.float32)

    def loss(p, x):
        return jnp.sum(jnp.square(lay.apply(p, x)))

    layers.set_im2col_stem(False)
    y0 = lay.apply(params, x)
    g0 = jax.grad(loss)(params, x)
    layers.set_im2col_stem(True)
    y1 = lay.apply(params, x)
    g1 = jax.grad(loss)(params, x)

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_im2col_only_touches_single_channel_convs():
    """n_in > 1 convs must lower identically with the flag on (the
    patches ordering is only pinned for C_in == 1)."""
    lay = layers.conv2d(4, 8, 3, 1, 1)
    params = lay.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 4),
                    jnp.float32)
    layers.set_im2col_stem(True)
    y1 = lay.apply(params, x)
    layers.set_im2col_stem(False)
    y0 = lay.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))


def test_full_model_forward_identical_under_im2col():
    """SharedDis regress_b (whose stem is the 7x7 C_in=1 conv) end to
    end, flag on vs off."""
    from lsps_tpu.config import default_hyperparameters
    from lsps_tpu.models import build_model

    hyp = default_hyperparameters(reg_dim=12, small=True)
    hyp["dis"]["reg_dim"] = 12
    hyp["dis"]["ch"] = 4
    dis = build_model(hyp["dis"])
    params = dis.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(3).randn(2, 128, 128, 1) * 0.3,
                    jnp.float32)
    layers.set_im2col_stem(False)
    _, p0, _ = dis.regress_b(params, x)
    layers.set_im2col_stem(True)
    _, p1, _ = dis.regress_b(params, x)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=2e-4, atol=2e-4)
