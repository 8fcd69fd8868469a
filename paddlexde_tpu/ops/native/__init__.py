"""Native (C) runtime components, built lazily with the system toolchain.

The compute path is jax/XLA/Pallas; the host-side runtime around it — here
the input-pipeline batch assembler — is native C with OpenMP, standing in for
the reference's C++ DataLoader worker pool (paddle's dataloader behind
``example/D3STN/train_dde.py:99-124`` in DrownFish19/PaddleXDE).

Build model: compile-on-first-use via ``cc -O3 -fopenmp -shared`` into
``_build/`` next to this file (no pip, no setuptools at import time), loaded
with ctypes. Every entry point degrades to the numpy fallback when the
toolchain or the build is unavailable, so the package never hard-depends on a
compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["gather_windows", "native_available"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    src = os.path.join(_HERE, "batch_gather.c")
    build_dir = os.path.join(_HERE, "_build")
    so_path = os.path.join(build_dir, "libbatch_gather.so")
    try:
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
            os.makedirs(build_dir, exist_ok=True)
            tmp = so_path + ".tmp"
            cmd = ["cc", "-O3", "-fopenmp", "-shared", "-fPIC", src, "-o", tmp]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
    except (OSError, subprocess.SubprocessError):
        return None
    i64 = ctypes.c_int64
    for name in ("gather_windows", "gather_windows_tmajor"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(i64),
            i64, i64, i64, i64, i64, i64,
        ]
    return lib


def _lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        with _LOCK:
            if _LIB is None and not _TRIED:
                _LIB = _build_and_load()
                _TRIED = True
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def gather_windows(data: np.ndarray, starts, out: np.ndarray, win: int,
                   time_major: bool = False) -> bool:
    """Fill ``out`` with windows of ``data`` starting at ``starts``.

    Default layout: ``data [N, T_all, D]`` -> ``out [B, N, win, D]``;
    ``time_major``: ``data [T_all, N, D]`` -> ``out [B, win, N, D]``.
    Returns False (caller should use the numpy path) when the native library
    is unavailable or the arrays are not contiguous.
    """
    lib = _lib()
    if lib is None:
        return False
    if not (data.flags.c_contiguous and out.flags.c_contiguous):
        return False
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    b = out.shape[0]
    if time_major:
        t_all, n, d = data.shape
        fn = lib.gather_windows_tmajor
    else:
        n, t_all, d = data.shape
        fn = lib.gather_windows
    fn(
        data.ctypes.data_as(ctypes.c_char_p),
        out.ctypes.data_as(ctypes.c_char_p),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, n, t_all, d, win, data.itemsize,
    )
    return True
