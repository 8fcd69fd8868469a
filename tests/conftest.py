"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax imports.

This is how multi-chip sharding is tested without a pod (SURVEY §4, rebuild test
plan): XLA splits the host CPU into 8 logical devices; `shard_map`/`pjit` tests
then exercise real collectives over a `Mesh` with no TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Numeric-accuracy tests run in float64 (the reference keeps timelike values in
# float64 too); dedicated fp32 smoke tests override locally.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: repeated pytest runs skip recompilation.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
