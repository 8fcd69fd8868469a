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

# PXT_TPU_TESTS=1: run the @pytest.mark.tpu subset on the REAL chip (Mosaic-
# compiled kernels vs their jnp oracles — see tools/run_tpu_tests.sh). Keeps
# the axon platform, f32 (no x64 on TPU), and the shared TPU compile cache.
TPU_MODE = os.environ.get("PXT_TPU_TESTS", "0") == "1"


def _host_cache_key():
    """Node name + CPU-feature hash. Nodename alone is NOT enough: distinct
    machines across rounds can share a hostname while exposing different CPU
    features, and XLA:CPU AOT artifacts compiled under another feature
    profile SIGILL (or silently warn) on load — observed as cpu_aot_loader
    machine-feature warnings despite per-node keying."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = platform.processor() or ""
    tag = hashlib.md5(flags.encode()).hexdigest()[:8]
    return f"{platform.node() or 'host'}-{tag}"


if TPU_MODE:
    # per-host subdir, same reasoning as the CPU branch below: the root
    # .bench_cache also collects XLA:CPU host-side artifacts which SIGILL
    # when loaded under another host's feature profile
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                              ".bench_cache", _host_cache_key())
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    # Numeric-accuracy tests run in float64 (the reference keeps timelike
    # values in float64 too); dedicated fp32 smoke tests override locally.
    jax.config.update("jax_enable_x64", True)

    # Persistent compilation cache: repeated pytest runs skip recompilation.
    # PER-HOST subdirectory (nodename + CPU-feature hash, see
    # _host_cache_key): the repo persists across rounds on different
    # machines, and XLA:CPU AOT artifacts compiled under another host's
    # feature profile SIGILL/abort on load (observed as flaky mid-suite
    # "Fatal Python error: Aborted" — the cpu_aot_loader machine-feature
    # warnings are the tell).
    _cache_dir = os.path.join(
        os.path.dirname(__file__), ".jax_cache", _host_cache_key()
    )

jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_collection_modifyitems(config, items):
    import pytest

    if TPU_MODE:
        skip = pytest.mark.skip(
            reason="non-tpu test skipped under PXT_TPU_TESTS=1 (CPU suite "
            "runs without the env var)"
        )
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="needs the real chip: tools/run_tpu_tests.sh"
        )
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
