"""Shared per-host compilation-cache location for the perf tools.

The repo persists across rounds on different machines, and XLA:CPU AOT
artifacts (host-side programs cached alongside TPU executables) SIGILL when
loaded under a different CPU feature profile. Keying the cache by hostname
PLUS a CPU-feature hash (distinct machines can share a nodename across
rounds — observed as cpu_aot_loader machine-feature warnings despite
per-node keying) keeps reuse within a host and isolation across hosts —
same policy as bench.py and tests/conftest.py.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_cache_key() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = platform.processor() or ""
    tag = hashlib.md5(flags.encode()).hexdigest()[:8]
    return f"{platform.node() or 'host'}-{tag}"


def bench_cache_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        host_cache_key(),
    )


def enable(jax) -> None:
    try:
        jax.config.update("jax_compilation_cache_dir", bench_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
