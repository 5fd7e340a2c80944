"""Test configuration: CPU backend, x64, 8 virtual devices for mesh tests.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), per the distributed test strategy in
SURVEY.md §4. Numerical oracles run in float64.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The hosting environment's site customization force-registers a remote TPU
# platform and overwrites jax_platforms at interpreter boot; the env var
# alone is not enough — override the config after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NO persistent compile cache for the CPU suite: XLA:CPU AOT executable
# serialization is machine-fragile — stale entries from another host
# SIGILL on load, and writing large executables segfaulted inside
# jax compilation_cache.put_executable_and_time (deterministic mid-suite
# crash, reproduced twice). The TPU bench keeps its own cache (bench.py);
# CPU tests just recompile.

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Free jitted executables after each test module.

    With ~150 tests in one process the accumulated XLA:CPU executables
    eventually segfault the *compiler* on a fresh (even tiny) program —
    observed deterministically after ~120 tests on a 2-vCPU host, at a
    different test whenever the order shifts. Dropping the caches between
    modules keeps the live-executable population bounded; cross-module
    jit reuse is negligible."""
    yield
    jax.clear_caches()
