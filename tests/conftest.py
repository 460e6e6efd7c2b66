"""Test configuration: run on CPU with 8 virtual devices so sharding
logic is exercised without TPU hardware."""

import os

# force CPU: the dev machine may expose a TPU platform by default
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache: recompiles are the dominant cost here
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/lsps_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402

# float32-exact math for parity tests; production uses the fast default
# (bf16 MXU passes) unless overridden via config.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(23455)
