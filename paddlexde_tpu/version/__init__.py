"""Version / commit introspection.

TPU rebuild of the reference's ``paddlexde/version/`` (git introspection at
import time, ``version/__init__.py:5-38`` in DrownFish19/PaddleXDE). Lazy here —
no subprocess at import; ``commit`` resolves on first access via ``show()``.
"""

from __future__ import annotations

import os
import subprocess

__version__ = "0.1.0"
__all__ = ["__version__", "commit", "show"]

_commit_cache = None


def _git(*args: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return subprocess.check_output(
        ["git", *args], cwd=root, stderr=subprocess.DEVNULL, text=True
    ).strip()


def commit() -> str:
    """Current git revision of the installed tree ('unknown' outside a repo)."""
    global _commit_cache
    if _commit_cache is None:
        try:
            rev = _git("rev-parse", "HEAD")
            if _git("status", "--porcelain"):
                rev += ".dirty"
            _commit_cache = rev
        except Exception:
            _commit_cache = "unknown"
    return _commit_cache


def show() -> str:
    import jax

    info = (
        f"paddlexde_tpu {__version__} (commit {commit()})\n"
        f"jax {jax.__version__}, backend {jax.default_backend()}, "
        f"{jax.device_count()} device(s)"
    )
    print(info)
    return info
