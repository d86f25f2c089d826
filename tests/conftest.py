"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
XLA's forced host device count (the standard JAX trick; SURVEY section 4).
Must run before jax is imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's TPU plugin ignores JAX_PLATFORMS=cpu, so pin the default
# device instead; tests run on the virtual 8-device CPU backend.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
