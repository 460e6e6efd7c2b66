"""Pallas kernel correctness: fused IN+LeakyReLU forward + VJP vs the
composed reference ops, run in interpreter mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsps_tpu.ops import layers as L
from lsps_tpu.ops.pallas import norm_act


@pytest.fixture
def pallas_interpret():
    norm_act.set_pallas_enabled(True)
    norm_act.set_pallas_interpret(True)
    yield
    norm_act.set_pallas_enabled(None)
    norm_act.set_pallas_interpret(False)


def _reference(x):
    return L.leaky_relu(L.instance_norm(x))


def test_fused_forward_matches_composed(rng):
    x = jnp.array(rng.randn(2, 8, 8, 16).astype(np.float32) * 3 + 1)
    norm_act.set_pallas_enabled(False)
    y = norm_act.fused_instance_norm_leaky_relu(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_reference(x)),
                               rtol=1e-5, atol=1e-5)


def test_fused_forward_pallas_interpret(rng, pallas_interpret):
    x = jnp.array(rng.randn(2, 8, 8, 16).astype(np.float32) * 3 + 1)
    y = norm_act.fused_instance_norm_leaky_relu(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_reference(x)),
                               rtol=1e-5, atol=1e-5)


def test_fused_vjp_matches_autodiff(rng):
    x = jnp.array(rng.randn(2, 4, 4, 8).astype(np.float32) * 2)
    g = jnp.array(rng.randn(2, 4, 4, 8).astype(np.float32))
    norm_act.set_pallas_enabled(False)
    _, vjp_fused = jax.vjp(norm_act.fused_instance_norm_leaky_relu, x)
    _, vjp_ref = jax.vjp(_reference, x)
    np.testing.assert_allclose(np.asarray(vjp_fused(g)[0]),
                               np.asarray(vjp_ref(g)[0]),
                               rtol=1e-4, atol=1e-5)


def test_fused_vjp_pallas_interpret(rng, pallas_interpret):
    x = jnp.array(rng.randn(1, 4, 4, 8).astype(np.float32) * 2)
    g = jnp.array(rng.randn(1, 4, 4, 8).astype(np.float32))
    _, vjp_fused = jax.vjp(norm_act.fused_instance_norm_leaky_relu, x)
    # the custom bwd consults pallas_enabled() when the vjp CALLABLE
    # runs, so the pallas backward must execute before disabling
    dx_pallas = np.asarray(vjp_fused(g)[0])
    norm_act.set_pallas_enabled(False)
    _, vjp_ref = jax.vjp(_reference, x)
    np.testing.assert_allclose(dx_pallas, np.asarray(vjp_ref(g)[0]),
                               rtol=1e-4, atol=1e-5)


# --- plain InstanceNorm kernel (the res block's second, activation-free
# norm) -----------------------------------------------------------------

def test_plain_in_forward_matches_composed(rng):
    x = jnp.array(rng.randn(2, 8, 8, 16).astype(np.float32) * 3 + 1)
    norm_act.set_pallas_enabled(False)
    y = norm_act.fused_instance_norm(x)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(L.instance_norm(x)),
                               rtol=1e-5, atol=1e-5)


def test_plain_in_forward_pallas_interpret(rng, pallas_interpret):
    x = jnp.array(rng.randn(2, 8, 8, 16).astype(np.float32) * 3 + 1)
    y = norm_act.fused_instance_norm(x)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(L.instance_norm(x)),
                               rtol=1e-5, atol=1e-5)


def test_plain_in_vjp_matches_autodiff(rng):
    x = jnp.array(rng.randn(2, 4, 4, 8).astype(np.float32) * 2)
    g = jnp.array(rng.randn(2, 4, 4, 8).astype(np.float32))
    norm_act.set_pallas_enabled(False)
    _, vjp_fused = jax.vjp(norm_act.fused_instance_norm, x)
    _, vjp_ref = jax.vjp(L.instance_norm, x)
    np.testing.assert_allclose(np.asarray(vjp_fused(g)[0]),
                               np.asarray(vjp_ref(g)[0]),
                               rtol=1e-4, atol=1e-5)


def test_plain_in_vjp_pallas_interpret(rng, pallas_interpret):
    x = jnp.array(rng.randn(1, 4, 4, 8).astype(np.float32) * 2)
    g = jnp.array(rng.randn(1, 4, 4, 8).astype(np.float32))
    _, vjp_fused = jax.vjp(norm_act.fused_instance_norm, x)
    # execute the pallas backward before disabling (bwd checks the flag
    # at call time, not at trace time)
    dx_pallas = np.asarray(vjp_fused(g)[0])
    norm_act.set_pallas_enabled(False)
    _, vjp_ref = jax.vjp(L.instance_norm, x)
    np.testing.assert_allclose(dx_pallas, np.asarray(vjp_ref(g)[0]),
                               rtol=1e-4, atol=1e-5)


def test_bf16_plain_in_f32_stats(rng, pallas_interpret):
    """bf16 input: moments must accumulate in f32 (output close to the
    f32 reference after casting)."""
    xf = rng.randn(2, 8, 8, 16).astype(np.float32) * 3 + 1
    x = jnp.asarray(xf, jnp.bfloat16)
    y = norm_act.fused_instance_norm(x)
    assert y.dtype == jnp.bfloat16
    ref = L.instance_norm(jnp.asarray(xf))
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)
