"""Test configuration: force CPU backend with 8 virtual devices.

Must run before any jax import (SURVEY §4 item 4): sharding tests assert the
multi-device path matches single-device bitwise on a faked 8-device mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(2026)
