"""Test configuration: force an 8-device virtual CPU mesh.

This is how multi-chip sharding is tested without a pod (SURVEY §4, rebuild test
plan): XLA splits the host CPU into 8 logical devices; `shard_map`/`pjit` tests
then exercise real collectives over a `Mesh` with no TPU hardware.

NOTE: this environment's sitecustomize imports jax and registers the axon TPU
plugin before conftest runs, so env-var overrides are too late — use
jax.config.update, which works any time before first backend use.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Numeric-accuracy tests run in float64 (the reference keeps timelike values in
# float64 too); dedicated fp32 smoke tests override locally.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: repeated pytest runs skip recompilation.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
