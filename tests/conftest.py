"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This makes every test hermetic (no TPU required) while still exercising the
multi-device sharding logic (DP/sync-BN) on 8 virtual XLA CPU devices.
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compilation deterministic and quick for tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
