"""Host→device double-buffered prefetch.

The reference relied on torch DataLoader workers + pinned memory
(reference train_and_eval.py:13-15); here a background thread stages the next
batch onto the device (with the target sharding) while the current step runs,
so the TPU never waits on the host for steady-state steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, NamedTuple

import jax
import numpy as np

__all__ = ["device_prefetch", "Chunk", "chunk_batches"]


class Chunk(NamedTuple):
    """A stacked group of `unroll` training batches for the device-side loop.

    `images`/`labels` carry a leading (unroll,) microbatch axis; the last
    `unroll - n_valid` entries are padding (repeats of the final batch) that
    the scanned loop masks out, so every chunk — including the tail of a run
    whose step count is not a multiple of `unroll` — has identical shapes and
    reuses one compiled program.
    """

    images: np.ndarray
    labels: np.ndarray
    n_valid: int


def chunk_batches(iterator: Iterator, unroll: int) -> Iterator[Chunk]:
    """Stack per-step (images, labels, ...) batches into `Chunk`s of `unroll`
    ON THE HOST, before any device transfer.

    Doing the stack here (then `device_prefetch`-ing the stacked arrays once)
    avoids the device→host→device round trip that stacking already-device_put
    batches would cost; the counterpart of the reference's DataLoader
    collation (train_and_eval.py:13-15) for the multi-step device loop.
    """
    buf = []

    def emit(samples, n_valid):
        pad = unroll - len(samples)
        samples = samples + [samples[-1]] * pad
        return Chunk(
            np.stack([np.asarray(b[0]) for b in samples]),
            np.stack([np.asarray(b[1]) for b in samples]),
            n_valid,
        )

    for b in iterator:
        buf.append(b)
        if len(buf) == unroll:
            yield emit(buf, unroll)
            buf = []
    if buf:
        yield emit(buf, len(buf))


def device_prefetch(iterator: Iterator, sharding=None, buffer_size: int = 2) -> Iterator:
    """Wrap a host batch iterator; device_put happens `buffer_size` ahead."""

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    sentinel = object()

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
