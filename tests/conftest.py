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

# Persistent compilation cache: the suite is compile-dominated on a 1-core
# CPU host (first run ~13 min, mostly XLA); warm reruns drop to minutes.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Test-side reference computations (plain @ / einsum in asserts) must be exact.
# Library code pins its own precision where it matters.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full e2e pipelines; ~10+ min on CPU)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-pipeline tests that exceed the fast-tier "
        "budget on a 1-core CPU host (run with --runslow; they run by "
        "default where a TPU is attached)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
