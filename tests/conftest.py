"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run on a CPU mesh (multi-chip sharding paths in ``parallel/``
need 8 devices; the real environment exposes a single tunneled TPU). Two
layers of forcing are required:

* ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` before the CPU
  client initializes;
* ``jax.config.update("jax_platforms", "cpu")`` *after* importing jax —
  an env-var-only override is not enough because hardware-plugin site hooks
  (e.g. the axon TPU tunnel's sitecustomize) call
  ``jax.config.update("jax_platforms", ...)`` at interpreter startup, which
  takes precedence over ``JAX_PLATFORMS``.

Pallas kernels detect the CPU backend and run in interpreter mode
(``ops/pallas_kernels._interpret``).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
