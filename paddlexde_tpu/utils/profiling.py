"""Tracing / profiling hooks (SURVEY §5: the reference has none in-library;
its apps time with ``time.time()`` and count NFE with a mutable counter).

Here: a ``jax.profiler`` trace context for TensorBoard-viewable device
profiles, a wall-clock timer mirroring the demo harness's meter, and NFE
accounting comes from the solver itself (``AdaptiveStats.nfe`` rides the
integration carry — ``options={"return_stats": True}``).
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["trace", "Timer", "RunningAverageMeter"]


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler device trace into ``logdir`` (TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0


class RunningAverageMeter:
    """EMA meter (reference ``example/demo_utils.py:179-195``)."""

    def __init__(self, momentum: float = 0.99):
        self.momentum = momentum
        self.val = None
        self.avg = 0.0

    def update(self, val: float):
        self.avg = val if self.val is None else (
            self.avg * self.momentum + val * (1 - self.momentum)
        )
        self.val = val
