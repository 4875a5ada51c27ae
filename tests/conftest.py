"""Test configuration: force an 8-device virtual CPU mesh.

Must run before the first ``import jax`` anywhere in the test process, so the
multi-chip sharding paths (``parallel/``) can be exercised without TPU
hardware. Pallas kernels detect the CPU backend and run in interpreter mode.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
