"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The driver benches on the real TPU chip; tests exercise the same code
paths (Pallas kernels in interpreter mode, shardings over 8 virtual CPU
devices) without per-test TPU compile/tunnel latency.

Note: the axon TPU plugin ignores ``JAX_PLATFORMS`` env, so we must force
the platform through ``jax.config`` before the backend initializes.
"""

import os

# Must be set before the XLA backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(42)
