"""Test configuration: run all tests on CPU with 8 virtual devices.

This is the TPU-native analogue of the reference's ``mpirun=2`` test
variants (SURVEY.md §4): multi-device sharding is exercised on a virtual
CPU mesh via ``--xla_force_host_platform_device_count`` without hardware.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # force: never the axon TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize imports jax at interpreter start, so the env var
# alone is read too early — override the already-imported config too
jax.config.update("jax_platforms", "cpu")

# f64 on the CPU test mesh: convergence-order and Newton-tolerance tests
# need accurate reductions. Production TPU runs use f32/bf16 paths.
jax.config.update("jax_enable_x64", True)
# persistent compilation cache cuts repeat test-run latency drastically
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
