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
import pytest

# PXT_TPU_TESTS=1: run the @pytest.mark.tpu subset on the REAL chip (Mosaic-
# compiled kernels vs their jnp oracles — see tools/run_tpu_tests.sh). Keeps
# the axon platform, f32 (no x64 on TPU), and the shared TPU compile cache.
TPU_MODE = os.environ.get("PXT_TPU_TESTS", "0") == "1"

if TPU_MODE:
    # POST-MORTEM of the round-5 "recursion" saga (keep this — two rounds
    # of fixes chased the wrong mechanism): every on-chip test failed with
    # RecursionError while each passed standalone. It was NEVER stack
    # depth — pytest COLLECTION imports every test module, and one of them
    # (test_weak_order_implicit -> tools/measure_weak_orders) ran a
    # module-level jax.config.update("jax_enable_x64", True). Under x64,
    # Mosaic's _convert_element_type lowering helper infinitely recurses on
    # the int64 casts x64 introduces into the Pallas kernels (jax
    # lowering.py _convert_helper re-emits the same unsupported cast).
    # Fixed at the source (the tool enables x64 in main()/measure(), not at
    # import) AND guarded below: TPU-mode kernels are f32, x64 must be OFF
    # no matter what collection imported. setrecursionlimit stays mildly
    # raised only because deep solver traces deserve headroom under
    # pytest's extra frames — it was not the fix.
    import sys as _sys

    _sys.setrecursionlimit(max(3000, _sys.getrecursionlimit()))


def _host_cache_key():
    """Node name + CPU-IDENTITY hash (vendor/family/model/stepping/model
    name/flags). Nodename alone is NOT enough (distinct machines share
    "vm"), and the flags line alone is ALSO not enough: VM hosts masquerade
    identical flag lines while running different microarchitectures, and
    XLA detects the real uarch via CPUID (e.g. +prefer-no-scatter tuning) —
    observed as a cross-machine hash collision whose foreign XLA:CPU AOT
    artifacts SEGFAULTED mid-suite (cpu_aot_loader machine-feature warnings
    are the tell). Keep in sync with tools/_cache.py and bench.py."""
    import hashlib
    import platform

    fields = ("vendor_id", "cpu family", "model", "model name", "stepping",
              "flags")
    try:
        ident = []
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if not ln.strip():
                    break  # first CPU block only
                if ln.split(":")[0].strip() in fields:
                    ident.append(ln.strip())
        ident_s = "\n".join(ident)
    except OSError:
        ident_s = platform.processor() or ""
    tag = hashlib.md5(ident_s.encode()).hexdigest()[:8]
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

    # NO persistent compilation cache for the CPU suite. Two independent
    # segfault classes were traced to it (round 3):
    #   1. cross-MACHINE poisoning — XLA:CPU AOT artifacts compiled under a
    #      different microarchitecture SIGILL/segfault on load, and VM hosts
    #      masquerade identical nodenames AND cpuinfo flag lines while XLA
    #      detects the real uarch via CPUID (+prefer-no-scatter tuning), so
    #      even a nodename+flags-hash key COLLIDED across rounds;
    #   2. CONCURRENT access — two local jax processes sharing the dir
    #      segfaulted compilation_cache.get_executable_and_time
    #      deserializing an entry mid-run (cold cache, same host).
    # The warm-cache saving (~2x suite time) is not worth nondeterministic
    # aborts; CPU compiles are local LLVM and tolerably fast. TPU_MODE keeps
    # its cache: remote TPU compiles are ~15 min cold and those runs are
    # single-process.
    _cache_dir = None

if _cache_dir is not None:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(autouse=True, scope="module")
def _drop_live_executables():
    """Release compiled XLA:CPU executables between test modules.

    The full suite accumulates hundreds of live jitted programs (it runs
    cacheless — see above), and XLA:CPU's JIT segfaulted DETERMINISTICALLY
    inside backend_compile_and_load once the cumulative volume crossed a
    threshold (~160 tests in, reproduced 3/3 full runs at the same two
    adjacent heavy compiles; the same tests pass when their directory runs
    alone, and an unlimited-stack re-exec did NOT help — so it is
    live-JIT-state volume, not recursion depth or rlimits). Clearing JAX's
    jit caches at module granularity bounds the live-executable set to one
    module's worth; each module recompiles its own programs anyway, so the
    only cost is losing rare cross-module program reuse."""
    yield
    jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        # runs AFTER collection imported every test module: undo any
        # import-time global config mutation (the x64 post-mortem above)
        jax.config.update("jax_enable_x64", False)
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
