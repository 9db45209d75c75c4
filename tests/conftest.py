"""Test configuration: force an 8-device virtual CPU mesh.

jax may already be imported by the interpreter's sitecustomize (axon TPU
tunnel), so plain env assignment is not enough: update the jax config
directly before any backend is initialized.  Multi-chip shardings are
validated on virtual CPU devices; real-TPU benchmarks live in bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
