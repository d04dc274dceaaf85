"""Test configuration: force the CPU backend with 8 virtual devices.

Tests must run headless without TPU hardware (the reference had the same
story: only its CPU unit tests ran in CI, reference: .github/workflows/ci.yml).
Multi-chip sharding tests use the 8 virtual CPU devices.
"""

import os

# Must be set before the first backend initialization.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Overrides the axon/TPU plugin the image forces via JAX_PLATFORMS.
jax.config.update("jax_platforms", "cpu")

# Warm compile cache across test runs (XLA CPU compiles of the interpreted
# Pallas parity suites are the bulk of suite wall time).
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
