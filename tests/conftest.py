"""Test configuration: run on CPU with 8 virtual devices so sharding
logic is exercised without TPU hardware.

A pytest plugin in this environment initializes the JAX backend (on the
TPU 'axon' platform) before conftest runs, so setting env vars is not
enough — we reconfigure and clear the backends explicitly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache: recompiles are the dominant cost here —
# lsps_tpu.__init__._enable_xla_cache configures ~/.cache/lsps_xla at
# package import (opt-out LSPS_XLA_CACHE=0); no env-var config here,
# it would silently defeat that opt-out.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
except Exception:
    pass
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

# float32-exact math for parity tests; production uses the fast default
# (bf16 MXU passes) unless overridden via config.
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(23455)
