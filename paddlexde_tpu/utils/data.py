"""Host-side input pipeline helpers.

``prefetch`` runs a batch generator in a daemon thread with a bounded queue so
host-side window assembly overlaps device execution — the role the reference's
``paddle.io.DataLoader`` workers play (``train_dde.py:99-114`` in
DrownFish19/PaddleXDE). Because the dataset reuses its batch buffers, each
item is snapshotted (or device_put) before being queued.
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
    """Iterate ``iterable`` on a background thread, ``depth`` items ahead.

    ``transfer`` (default: ``jax.device_put`` on tuples of arrays) runs on the
    producer thread — typically the host->device upload, so the device copy of
    a reused buffer is taken before the next batch overwrites it.
    """
    if transfer is None:
        import jax
        import jax.numpy as jnp

        # jnp.array COPIES (device_put may alias the host buffer zero-copy on
        # CPU backends, and its H2D copy is async on accelerators — either way
        # the reused producer buffer must be snapshotted before the next item
        # overwrites it); block so the copy lands before the buffer is reused
        transfer = lambda item: jax.block_until_ready(
            jax.tree.map(lambda x: jnp.array(x), item)
        )

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []

    def producer():
        try:
            for item in iterable:
                q.put(transfer(item))
        except BaseException as exc:  # surfaced on the consumer thread
            err.append(exc)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
