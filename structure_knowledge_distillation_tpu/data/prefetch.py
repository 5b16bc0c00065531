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

__all__ = ["device_prefetch", "Chunk", "chunk_batches", "cast_batches",
           "put_global", "quantize_u8"]


def quantize_u8(images, mean) -> np.ndarray:
    """Re-quantize mean-subtracted f32 images to their original bytes.

    One fused add + truncating cast: (x + mean + 0.5) floors to
    round-half-up; values are in [0,255] by construction (integer−mean
    pixels round-trip exactly; pad pixels — value 0.0 == "exactly mean",
    which no byte represents — round by < 0.5/255). rint+clip would cost
    ~4 numpy passes per frame on a 1-core host, eating the transfer saving.
    The ONE quantizer for both the train wire (cast_batches) and the eval
    wire (training.evaluate), so the rounding convention cannot diverge."""
    mean05 = np.asarray(mean, np.float32) + np.float32(0.5)
    return (np.asarray(images) + mean05).astype(np.uint8)


def put_global(x, sharding):
    """Place a host batch onto the mesh, multi-controller-safe.

    Single-process (this environment, single-host pods): plain device_put.
    Multi-process (one controller per TPU host, jax.distributed
    initialized): each process holds only its OWN slice of the global batch
    (batch_iterator num_shards/shard_index), and
    jax.make_array_from_process_local_data assembles the logical global
    array from the per-process shards — no host ever materializes the full
    batch. The returned jax.Array is identical in either mode."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding) if sharding is not None \
            else jax.device_put(x)
    if sharding is None:
        raise ValueError("multi-process placement requires an explicit "
                         "sharding (the global array layout)")
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def cast_batches(iterator: Iterator, image_dtype=None, label_dtype=None,
                 image_mean=None) -> Iterator:
    """Narrow the wire format of (images, labels, ...) batches on the host.

    With bf16 compute the model's first op casts f32 inputs to bf16 anyway
    (models/resnet_pspnet.py:336) — casting on the host instead is
    bit-identical and HALVES the bytes crossing host→device (and, with
    uint8 labels — valid whenever classes+ignore fit in a byte — cuts the
    label stream 4×). On this environment's ~25 MB/s relay that is the
    difference between a transfer-bound and a compute-bound step; on real
    PCIe hosts it halves input DMA traffic. The losses cast labels back to
    int32 on device (losses/task.py:30).

    With `image_mean` set and image_dtype uint8, the mean-subtracted f32
    crop is re-quantized to its original byte value (x + mean rounds back to
    the exact uint8 the augmentation produced — integers survive the f32
    subtract) and the train step re-subtracts the mean on device: another
    2× off the wire. Only pad pixels (value 0.0 == "exactly mean", which no
    byte represents) round, by < 0.5/255 — and flagship 512² Cityscapes
    crops never pad (min scale 0.7 of 1024-high frames)."""
    for b in iterator:
        images, labels, *rest = b
        if image_dtype is not None:
            if image_mean is not None and np.dtype(image_dtype) == np.uint8:
                images = quantize_u8(images, image_mean)
            else:
                images = np.asarray(images).astype(image_dtype)
        if label_dtype is not None:
            labels = np.asarray(labels).astype(label_dtype)
        yield (images, labels, *rest)


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


class _ProducerError(NamedTuple):
    """Carries a producer-thread exception to the consuming thread."""

    exc: BaseException


def device_prefetch(iterator: Iterator, sharding=None, buffer_size: int = 2) -> Iterator:
    """Wrap a host batch iterator; device_put happens `buffer_size` ahead.

    Producer-thread exceptions are re-raised in the consumer (they would
    otherwise truncate the epoch silently)."""

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    sentinel = object()

    def _put(x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x  # names / metadata stay on host
        return put_global(x, sharding)

    def producer():
        try:
            for item in iterator:
                q.put(jax.tree.map(_put, item))
        except BaseException as e:  # noqa: BLE001 — re-raised in the consumer
            # A swallowed loader error would end a 40k-step run silently, as
            # if the data had simply run out; surface it on the main thread.
            q.put(_ProducerError(e))
        else:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, _ProducerError):
            raise item.exc
        yield item
