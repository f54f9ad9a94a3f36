"""Test configuration: run all tests on CPU with 8 virtual devices.

This is the TPU-native analogue of the reference's ``mpirun=2`` test
variants (SURVEY.md §4): multi-device sharding is exercised on a virtual
CPU mesh via ``--xla_force_host_platform_device_count`` without hardware.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# persistent compilation cache cuts repeat test-run latency drastically
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
