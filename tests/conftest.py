"""Test configuration: run on CPU with 8 virtual devices so sharding
logic is exercised without TPU hardware.

A pytest plugin in this environment initializes the JAX backend (on the
TPU 'axon' platform) before conftest runs, so setting env vars is not
enough — we reconfigure and clear the backends explicitly.
"""

import os

# Silence XLA:CPU's cpu_aot_loader machine-feature check: it records
# the XLA option pseudo-features (+prefer-no-gather/+prefer-no-scatter)
# in cached AOT results and then flags them as "unsupported host
# features" on EVERY persistent-cache load — even for entries compiled
# on this very machine — flooding stderr with bogus SIGILL warnings
# that bury real output.  Real failures still raise Python-side.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

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

# Host-path bit-parity claims assume NEP-50 scalar promotion
# (docs/PARITY.md #10); fail loudly rather than mysteriously on 1.x.
assert int(np.__version__.split(".")[0]) >= 2, (
    f"bit-parity tests require numpy >= 2 (NEP 50), got {np.__version__}")


@pytest.fixture
def rng():
    return np.random.RandomState(23455)
