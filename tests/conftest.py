"""Test harness: force an 8-device virtual CPU platform.

Multi-chip hardware is not available in CI, so sharding/pjit tests run on a
virtual CPU mesh. The env vars must be set before JAX initializes, hence at
conftest import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ["JAX_PLATFORMS"] = "cpu"

# Force CPU even when the session environment pins a TPU platform (e.g. a
# tunneled axon plugin registered from sitecustomize, which freezes
# JAX_PLATFORMS at interpreter start) — unit tests must be fast and
# deterministic; TPU-facing checks live in bench.py.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
