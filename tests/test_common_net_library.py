"""Construction + behavior tests for the remaining common_net library
blocks (reference common_net.py:12-103, 183-379) — GaussianSmoother,
GaussianVAE/2D heads, Bias2d, and the BN/INS conv wrappers and res
blocks.  Dead code in the reference (SURVEY.md §2.9) but part of the
reusable op library, so each must build, run, and keep its documented
shape/semantic contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsps_tpu.ops import layers as L

KEY = jax.random.PRNGKey(0)
X = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3) * 0.5,
                jnp.float32)


def test_gaussian_smoother_matches_cv2_kernel():
    cv2 = pytest.importorskip("cv2")
    lay = L.gaussian_smoother(5)
    p = lay.init(KEY)
    y = lay.apply(p, X)
    assert y.shape == X.shape
    # channelwise parity with cv2 filter2D + replicate border
    k1 = cv2.getGaussianKernel(5, -1)
    k2 = (k1 @ k1.T).astype(np.float32)
    for c in range(3):
        ref = cv2.filter2D(np.asarray(X[0, :, :, c]), -1, k2,
                           borderType=cv2.BORDER_REPLICATE)
        np.testing.assert_allclose(np.asarray(y[0, :, :, c]), ref,
                                   rtol=1e-5, atol=1e-5)


def test_gaussian_smoother_kernel_table_parity():
    cv2 = pytest.importorskip("cv2")
    # k <= 7 uses cv2's fixed small-kernel tables bit-exactly; larger
    # kernels use the analytic sigma formula (cv2 additionally quantizes
    # those, which dead-code parity does not warrant)
    for k in (3, 5, 7):
        np.testing.assert_allclose(
            L._gaussian_kernel_1d(k), cv2.getGaussianKernel(k, -1)[:, 0],
            rtol=1e-6, atol=1e-8, err_msg=f"k={k}")
    np.testing.assert_allclose(L._gaussian_kernel_1d(9).sum(), 1.0,
                               rtol=1e-6)


def test_gaussian_vae_head():
    head = L.GaussianVAEHead(6, 4)
    p = head.init(KEY)
    x = jnp.ones((3, 6))
    mu, sd = head.apply(p, x)
    assert mu.shape == (3, 4) and sd.shape == (3, 4)
    assert np.all(np.asarray(sd) > 0)  # softplus
    # preset N(0, 0.002) heads are tiny
    assert float(jnp.abs(p["en_mu"]["w"]).max()) < 0.02
    z, mu2, sd2 = head.sample(p, x, jax.random.PRNGKey(1))
    assert z.shape == mu.shape
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(mu2))


def test_gaussian_vae_2d_head():
    head = L.GaussianVAE2DHead(3, 5, 3, 2, 1)
    p = head.init(KEY)
    mu, sd = head.apply(p, X)
    assert mu.shape == (2, 4, 4, 5)
    assert np.all(np.asarray(sd) > 0)
    z, _, _ = head.sample(p, X, jax.random.PRNGKey(1))
    assert z.shape == mu.shape


def test_bias2d():
    lay = L.bias2d(3)
    p = lay.init(KEY)
    y = lay.apply(p, X)
    np.testing.assert_allclose(np.asarray(y - X),
                               np.broadcast_to(np.asarray(p["b"]), X.shape),
                               rtol=1e-6, atol=1e-7)


def test_batch_norm_layer_2d_and_4d():
    bn = L.batch_norm_layer(3, affine=True)
    p = bn.init(KEY)
    y = np.asarray(bn.apply(p, X))
    # normalized over (N, H, W) per channel
    assert abs(y[..., 0].mean()) < 1e-5
    assert y[..., 0].std() == pytest.approx(1.0, abs=1e-3)

    bn1 = L.batch_norm_layer(4, affine=False)
    x2 = jnp.asarray(np.random.RandomState(1).randn(16, 4), jnp.float32)
    y2 = np.asarray(bn1.apply(bn1.init(KEY), x2))
    assert abs(y2[:, 1].mean()) < 1e-5


@pytest.mark.parametrize("maker,kw,out_ch", [
    (L.leaky_relu_ins_conv2d, dict(kernel_size=3, stride=1, padding=1), 5),
    (L.relu_ins_conv2d, dict(kernel_size=3, stride=1, padding=1), 5),
    (L.leaky_relu_bn_conv2d, dict(kernel_size=3, stride=1, padding=1), 5),
    (L.leaky_relu_bnns_conv2d, dict(kernel_size=3, stride=1, padding=1), 5),
])
def test_conv_wrapper_blocks(maker, kw, out_ch):
    lay = maker(3, out_ch, **kw)
    p = lay.init(KEY)
    y = lay.apply(p, X)
    assert y.shape == (2, 8, 8, out_ch)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("maker", [
    L.leaky_relu_ins_conv_transpose2d,
    L.relu_ins_conv_transpose2d,
    L.leaky_relu_bn_conv_transpose2d,
])
def test_conv_transpose_wrapper_blocks(maker):
    lay = maker(3, 5, 3, 2, 1, 1)
    p = lay.init(KEY)
    y = lay.apply(p, X)
    assert y.shape == (2, 16, 16, 5)  # (8-1)*2 - 2 + 3 + 1


def test_bnns_conv_transpose_block():
    lay = L.leaky_relu_bnns_conv_transpose2d(3, 5, 3, 1, 1)
    y = lay.apply(lay.init(KEY), X)
    assert y.shape == (2, 8, 8, 5)


def test_bn_linear_and_res_blocks():
    lin = L.leaky_relu_bn_linear(6, 4)
    y = lin.apply(lin.init(KEY), jnp.ones((5, 6)))
    assert y.shape == (5, 4)

    for maker in (L.leaky_relu_res_block, L.leaky_relu_bnns_res_block):
        blk = maker(3, 3, 3, 1, 1)
        y = blk.apply(blk.init(KEY), X)
        assert y.shape == X.shape
        assert np.isfinite(np.asarray(y)).all()
