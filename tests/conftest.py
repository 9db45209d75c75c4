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


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_executable_memory():
    """Release compiled executables at module boundaries.

    The full suite compiles thousands of XLA:CPU executables; keeping
    them all loaded eventually aborts the process inside
    ``backend_compile_and_load`` (native SIGSEGV/SIGABRT after ~350
    tests, no Python-level error).  Cross-module jit-cache hits are
    rare — each test file exercises its own kernels — so clearing per
    module costs little and bounds the live-executable footprint.
    """
    yield
    jax.clear_caches()
