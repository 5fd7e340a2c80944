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
# persistent compile cache: repeated suite runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
