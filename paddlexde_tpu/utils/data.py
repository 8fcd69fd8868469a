"""Host-side input pipeline helpers.

``prefetch`` runs a batch generator in a daemon thread with a bounded queue so
host-side window assembly overlaps device execution — the role the reference's
``paddle.io.DataLoader`` workers play (``train_dde.py:99-114`` in
DrownFish19/PaddleXDE). Because the dataset reuses its batch buffers, each
item is SNAPSHOTTED on the producer thread before being queued.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

__all__ = ["prefetch"]

_SENTINEL = object()


def prefetch(
    iterable: Iterable,
    depth: int = 2,
    transfer: Optional[Callable] = None,
) -> Iterator:
    """Iterate ``iterable`` on a background thread, ``depth`` (>= 1) items ahead.

    ``transfer`` runs on the producer thread. The default COPIES each item to
    device with ``jnp.array`` and blocks until the copy lands — deliberately
    NOT ``jax.device_put``, which aliases the host buffer zero-copy on CPU
    backends and copies asynchronously on accelerators; either would let the
    producer's next batch overwrite a reused buffer before it was read.

    Early termination is safe: closing/abandoning the returned generator stops
    the producer thread (no thread or queued-batch leak).
    """
    if depth < 1:
        raise ValueError(
            f"depth must be >= 1 (got {depth}); queue.Queue(0) would be "
            f"UNBOUNDED and eagerly drain the whole iterable"
        )
    if transfer is None:
        import jax
        import jax.numpy as jnp

        transfer = lambda item: jax.block_until_ready(
            jax.tree.map(lambda x: jnp.array(x), item)
        )

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    err: list = []

    def _put(item) -> bool:
        """put that gives up once the consumer has stopped."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterable:
                if not _put(transfer(item)):
                    return
        except BaseException as exc:  # surfaced on the consumer thread
            err.append(exc)
        finally:
            _put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        try:  # drain so a blocked producer unblocks promptly
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
