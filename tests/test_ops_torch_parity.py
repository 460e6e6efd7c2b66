"""Bit-level parity of our NHWC functional ops against PyTorch (CPU).

These tests pin the exact op semantics that the mm-level accuracy parity
depends on: Conv2d, ConvTranspose2d (stride/padding/output_padding),
InstanceNorm2d(affine=False), LeakyReLU, grouped conv, Linear, Softplus.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lsps_tpu.ops import layers as L


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _from_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("k,s,p,cin,cout", [
    (7, 1, 3, 1, 8), (7, 2, 3, 1, 8), (3, 2, 1, 8, 16), (1, 1, 0, 8, 4),
    (2, 1, 0, 16, 20),  # the Post head shape (lsps_nets.py:123)
])
def test_conv2d_matches_torch(rng, k, s, p, cin, cout):
    x = rng.randn(2, 16, 16, cin).astype(np.float32)
    w = rng.randn(k, k, cin, cout).astype(np.float32) * 0.1
    b = rng.randn(cout).astype(np.float32)

    layer = L.conv2d(cin, cout, k, s, p)
    ours = np.asarray(layer.apply({"w": jnp.array(w), "b": jnp.array(b)},
                                  jnp.array(x)))

    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # OIHW
    theirs = _from_nchw(F.conv2d(_nchw(x), wt, torch.from_numpy(b),
                                 stride=s, padding=p))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s,p,op,cin,cout", [
    (3, 2, 1, 1, 16, 8),   # gen decoder upsample (lsps_nets.py:223)
    (1, 1, 0, 0, 8, 1),    # gen output head (lsps_nets.py:226)
    (4, 1, 0, 0, 20, 32),  # mapping first layer (lsps_nets.py:17)
    (4, 2, 1, 0, 32, 16),  # mapping upsample (lsps_nets.py:19-23)
])
def test_conv_transpose_matches_torch(rng, k, s, p, op, cin, cout):
    x = rng.randn(2, 8, 8, cin).astype(np.float32)
    w = rng.randn(k, k, cin, cout).astype(np.float32) * 0.1
    b = rng.randn(cout).astype(np.float32)

    layer = L.conv2d_transpose(cin, cout, k, s, p, op)
    ours = np.asarray(layer.apply({"wt": jnp.array(w), "b": jnp.array(b)},
                                  jnp.array(x)))

    wt = torch.from_numpy(np.transpose(w, (2, 3, 0, 1)))  # (in,out,kh,kw)
    theirs = _from_nchw(F.conv_transpose2d(
        _nchw(x), wt, torch.from_numpy(b), stride=s, padding=p,
        output_padding=op))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_grouped_conv_matches_torch(rng):
    cin, cout, groups = 16, 16, 4
    x = rng.randn(2, 8, 8, cin).astype(np.float32)
    w = rng.randn(3, 3, cin // groups, cout).astype(np.float32) * 0.1
    b = rng.randn(cout).astype(np.float32)

    layer = L.conv2d(cin, cout, 3, 1, 1, groups=groups)
    ours = np.asarray(layer.apply({"w": jnp.array(w), "b": jnp.array(b)},
                                  jnp.array(x)))
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
    theirs = _from_nchw(F.conv2d(_nchw(x), wt, torch.from_numpy(b),
                                 stride=1, padding=1, groups=groups))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_instance_norm_matches_torch(rng):
    x = rng.randn(3, 8, 8, 5).astype(np.float32) * 4 + 2
    ours = np.asarray(L.instance_norm(jnp.array(x)))
    theirs = _from_nchw(F.instance_norm(_nchw(x)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_leaky_relu_default_slope(rng):
    x = rng.randn(100).astype(np.float32)
    ours = np.asarray(L.leaky_relu(jnp.array(x)))
    theirs = F.leaky_relu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_linear_matches_torch(rng):
    x = rng.randn(4, 10).astype(np.float32)
    w = rng.randn(10, 7).astype(np.float32)
    b = rng.randn(7).astype(np.float32)
    layer = L.linear(10, 7)
    ours = np.asarray(layer.apply({"w": jnp.array(w), "b": jnp.array(b)},
                                  jnp.array(x)))
    theirs = F.linear(torch.from_numpy(x), torch.from_numpy(w.T),
                      torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_res_block_residual_add(rng):
    key = jax.random.PRNGKey(0)
    blk = L.leaky_ins_res_block(8, 8)
    params = blk.init(key)
    x = jnp.array(rng.randn(2, 8, 8, 8).astype(np.float32))
    y = blk.apply(params, x)
    assert y.shape == x.shape
    # zeroing the second conv weight must reduce the block to identity + IN
    import jax.tree_util as jtu
    # body params: [conv, in, lrelu, conv, in]
    params[3]["w"] = jnp.zeros_like(params[3]["w"])
    params[3]["b"] = jnp.zeros_like(params[3]["b"])
    y2 = blk.apply(params, x)
    # out = x + IN(0) = x + normalized zeros -> exactly x
    np.testing.assert_allclose(np.asarray(y2), np.asarray(x), atol=1e-5)


def test_gaussian_noise_layer_train_eval():
    layer = L.gaussian_noise_layer()
    x = jnp.ones((2, 4, 4, 3))
    out_eval = layer.apply({}, x, rng=None, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))
    out_train = layer.apply({}, x, rng=jax.random.PRNGKey(1), train=True)
    assert np.abs(np.asarray(out_train) - np.asarray(x)).max() > 0.1


def test_init_distributions():
    key = jax.random.PRNGKey(42)
    conv = L.conv2d(64, 64, 3, 1, 1)
    p = conv.init(key)
    std = np.std(np.asarray(p["w"]))
    assert 0.018 < std < 0.022  # gaussian_weights_init N(0, 0.02)
    bound = 1.0 / np.sqrt(64 * 9)
    assert np.abs(np.asarray(p["b"])).max() <= bound + 1e-6
