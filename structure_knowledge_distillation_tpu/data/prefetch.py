"""Host→device double-buffered prefetch.

The reference relied on torch DataLoader workers + pinned memory
(reference train_and_eval.py:13-15); here a background thread stages the next
batch onto the device (with the target sharding) while the current step runs,
so the TPU never waits on the host for steady-state steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax

__all__ = ["device_prefetch"]


def device_prefetch(iterator: Iterator, sharding=None, buffer_size: int = 2) -> Iterator:
    """Wrap a host batch iterator; device_put happens `buffer_size` ahead."""

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    sentinel = object()

    import numpy as np

    def _put(x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x  # names / metadata stay on host
        return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)

    def producer():
        try:
            for item in iterator:
                q.put(jax.tree.map(_put, item))
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
