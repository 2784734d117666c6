"""Test config: force local CPU JAX.

This machine's ``sitecustomize`` (PYTHONPATH: /root/.axon_site) registers a
remote-TPU PJRT plugin and initializes JAX at interpreter startup, so
neither platform nor device count can be changed from here. We pin the
platform to CPU (effective because the axon plugin only claims the 'axon'
platform) and run multi-device tests in subprocesses with a cleaned
environment (see tests/test_parallel.py: _run_clean).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: the parity tests compile many conv graphs;
# repeat suite runs skip straight to execution.
from master_thesis_tpu.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache_cpu")
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
