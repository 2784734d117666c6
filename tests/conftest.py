"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed)."""

import os

# Force CPU: the session environment points JAX at the remote TPU (axon),
# which is both slow to compile against and a shared resource — unit tests
# must run on the local virtual-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
