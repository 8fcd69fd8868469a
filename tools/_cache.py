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
    # hash the full stable CPU identity, not just the flags line: VM hosts
    # masquerade identical nodenames ("vm") AND identical flag lines while
    # running different microarchitectures, and XLA detects the real uarch
    # via CPUID (e.g. +prefer-no-scatter tuning on some models) — observed
    # as a cross-machine hash COLLISION whose foreign AOT artifacts
    # segfaulted mid-suite. vendor/family/model/stepping discriminate uarch
    # even under masquerade.
    _FIELDS = ("vendor_id", "cpu family", "model", "model name", "stepping",
               "flags")
    try:
        ident = []
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if not ln.strip():
                    break  # first CPU block only
                if ln.split(":")[0].strip() in _FIELDS:
                    ident.append(ln.strip())
        ident_s = "\n".join(ident)
    except OSError:
        ident_s = platform.processor() or ""
    tag = hashlib.md5(ident_s.encode()).hexdigest()[:8]
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
