"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/multi-chip tests need multiple devices; real multi-chip TPU hardware
is not available in CI, so we force the CPU backend with 8 virtual devices.
Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force-override the env's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Test-side reference computations (plain @ / einsum in asserts) must be exact.
# Library code pins its own precision where it matters.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
