"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere — this is the
TPU-native analogue of a fake multi-device backend (SURVEY.md §4).

IMPORTANT (this host): the JAX_PLATFORMS *env var* is overridden by the
deployment (axon TPU plugin); only `jax.config.update('jax_platforms', ...)`
reliably selects the CPU backend. Running tests on the tunneled TPU both
skews numerics (bf16 default matmul) and deadlocks when two processes
contend for the single chip.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(0)
