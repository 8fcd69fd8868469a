"""Shared per-host compilation-cache location for the perf tools.

The repo persists across rounds on different machines, and XLA:CPU AOT
artifacts (host-side programs cached alongside TPU executables) SIGILL when
loaded under a different CPU feature profile. Keying the cache by hostname
keeps reuse within a host and isolation across hosts — same policy as
bench.py and tests/conftest.py.
"""

from __future__ import annotations

import os
import platform


def bench_cache_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
        platform.node() or "host",
    )


def enable(jax) -> None:
    try:
        jax.config.update("jax_compilation_cache_dir", bench_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
