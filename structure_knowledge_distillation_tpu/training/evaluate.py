"""Evaluation: whole-image / sliding / multiscale prediction, mIoU, PNGs.

Counterpart of reference networks/evaluate.py:
  * predict_whole (reference :106-113): one forward, logits upsampled
    (align-corners) to the output size — here the forward + upsample + argmax
    compile into one jitted function,
  * predict_multiscale (reference :115-134) with optional flip averaging,
  * predict_sliding (reference :70-104): overlapping tiles (overlap ⅓) for
    memory-bounded inference,
  * confusion matrix via scatter-add (reference :136-154 used np.bincount),
  * IU = tp / max(1, pos + res − tp), mean over classes (reference :200-206),
  * palette PNGs and trainId→labelId remap for test-server submission
    (reference :30-61, :187-191).
"""

from __future__ import annotations

import functools
import os
from math import ceil
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from structure_knowledge_distillation_tpu.ops.resize import resize_bilinear_align_corners

__all__ = [
    "get_palette",
    "confusion_matrix",
    "iu_from_confusion",
    "make_predictor",
    "make_msf_val_batch_fn",
    "predict_sliding",
    "predict_multiscale",
    "evaluate_main",
    "evaluate_sharded",
    "evaluate_spatial",
]


def get_palette(num_cls: int) -> list:
    """Standard PASCAL-style bit-interleaved palette (reference :40-61)."""
    palette = [0] * (num_cls * 3)
    for j in range(num_cls):
        lab = j
        i = 0
        while lab:
            palette[j * 3 + 0] |= ((lab >> 0) & 1) << (7 - i)
            palette[j * 3 + 1] |= ((lab >> 1) & 1) << (7 - i)
            palette[j * 3 + 2] |= ((lab >> 2) & 1) << (7 - i)
            i += 1
            lab >>= 3
    return palette


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_label"))
def confusion_matrix(
    pred: jnp.ndarray, label: jnp.ndarray, num_classes: int, ignore_label: int = 255
) -> jnp.ndarray:
    """(C, C) counts with rows = ground truth, cols = prediction."""
    label = label.astype(jnp.int32).ravel()
    pred = pred.astype(jnp.int32).ravel()
    mask = label != ignore_label
    idx = jnp.where(mask, label, 0) * num_classes + pred
    counts = jnp.zeros((num_classes * num_classes,), jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    counts = counts.at[idx].add(mask.astype(counts.dtype))
    return counts.reshape(num_classes, num_classes)


def iu_from_confusion(conf: np.ndarray) -> Tuple[float, np.ndarray]:
    conf = np.asarray(conf, np.float64)
    pos = conf.sum(1)
    res = conf.sum(0)
    tp = np.diag(conf)
    iu = tp / np.maximum(1.0, pos + res - tp)
    return float(iu.mean()), iu


def make_predictor(model, out_size: Tuple[int, int]) -> Callable:
    """Jitted whole-image forward: logits upsampled to out_size (f32)."""

    @jax.jit
    def predict(variables, image: jnp.ndarray) -> jnp.ndarray:
        preds = model.apply(variables, image, train=False)
        logits = preds[0] if isinstance(preds, (tuple, list)) else preds
        return resize_bilinear_align_corners(logits.astype(jnp.float32), out_size)

    return predict


@functools.lru_cache(maxsize=32)
def _cached_eval_fn(maker, model, out_size, num_classes, ignore_label,
                    mean_tuple):
    """Memoize the jitted eval programs across evaluate_main/evaluate_sharded
    calls. A fresh `jax.jit` wrapper per call means a fresh trace+compile —
    on the real chip that is a ~minute of recompilation at EVERY in-training
    eval. flax Modules are frozen dataclasses, so (maker, model, …) is a
    sound cache key."""
    mean = np.asarray(mean_tuple, np.float32) if mean_tuple is not None else None
    return maker(model, out_size, num_classes, ignore_label, input_mean=mean)


def _mean_key(input_mean):
    return tuple(float(m) for m in input_mean) if input_mean is not None else None


def _fast_val_fn_xla(model, out_size, num_classes, ignore_label, input_mean=None):
    return make_fast_val_fn(model, out_size, num_classes, ignore_label,
                            input_mean=input_mean, use_pallas=False)


def _quantize_wire(image: np.ndarray, mean) -> np.ndarray:
    """Host side of the u8 eval wire: integer−mean pixels (every unscaled,
    unpadded val frame) round-trip exactly through (x + mean) → uint8.
    Shares the one quantizer with the train wire (data.prefetch)."""
    from structure_knowledge_distillation_tpu.data.prefetch import quantize_u8

    return quantize_u8(image, mean)


def _dequantize_wire(image: jnp.ndarray, mean) -> jnp.ndarray:
    if image.dtype == jnp.uint8 and mean is not None:
        return image.astype(jnp.float32) - jnp.asarray(mean, jnp.float32)
    return image


def make_fast_val_fn(model, out_size: Tuple[int, int], num_classes: int,
                     ignore_label: int = 255, input_mean=None,
                     use_pallas: bool = True) -> Callable:
    """Jitted forward + upsample + argmax + confusion, all on device.

    The default val path (one scale, no flip) never moves the upsampled
    logits to the host — only the uint8 prediction (for PNGs) and the (C,C)
    confusion counts. Versus shipping (H,W,C) f32 logits per image this cuts
    the device→host transfer ~80× and removes the host argmax.

    With `input_mean` set, images arrive as re-quantized uint8 (4× less
    host→device traffic — a full-res Cityscapes frame is 24 MB f32) and are
    de-quantized on device; exact for unscaled/unpadded val frames.
    """

    @jax.jit
    def run(variables, image: jnp.ndarray, label: jnp.ndarray,
            h: jnp.ndarray, w: jnp.ndarray):
        image = _dequantize_wire(image, input_mean)
        preds = model.apply(variables, image, train=False)
        logits = preds[0] if isinstance(preds, (tuple, list)) else preds
        from structure_knowledge_distillation_tpu.ops.pallas_eval import (
            argmax_kernel_fits,
            upsampled_argmax,
        )

        if (use_pallas and jax.default_backend() == "tpu"
                and argmax_kernel_fits(logits.shape, out_size)):
            # fused upsample+argmax: never materializes the (H,W,C) f32
            # upsampled logits (159 MB at Cityscapes full res)
            pred = upsampled_argmax(logits, out_size)[0].astype(jnp.uint8)
        else:
            up = resize_bilinear_align_corners(
                logits.astype(jnp.float32), out_size)
            pred = jnp.argmax(up[0], axis=-1).astype(jnp.uint8)
        # crop-to-`size` equivalent (the slow path slices [:h, :w], reference
        # evaluate.py:183-185): padded rows/cols are forced to ignore so any
        # padding convention — not just ignore-padded labels — stays out of
        # the confusion matrix. Static shapes; h/w are device scalars.
        in_bounds = (jnp.arange(out_size[0])[:, None] < h) & (
            jnp.arange(out_size[1])[None, :] < w)
        label = jnp.where(in_bounds, label, ignore_label)
        conf = confusion_matrix(pred, label, num_classes, ignore_label)
        return pred, conf

    return run


def make_fast_val_batch_fn(model, out_size: Tuple[int, int], num_classes: int,
                           ignore_label: int = 255, input_mean=None) -> Callable:
    """Batched fast-val: forward + upsample + argmax + confusion for a WHOLE
    group of images in one dispatch. With the batch sharded on the mesh's
    data axis, each device evaluates its own images and the (C,C) confusion
    reduction becomes a single ICI all-reduce — the full-res Cityscapes val
    sweep divides by the data-parallel degree (the reference evaluates
    batch-1 on one GPU, networks/evaluate.py:156-175).

    Padded slots are masked by passing h=w=0: every pixel lands out of
    bounds → ignore_label → zero confusion contribution."""

    @jax.jit
    def run(variables, images: jnp.ndarray, labels: jnp.ndarray,
            hs: jnp.ndarray, ws: jnp.ndarray):
        images = _dequantize_wire(images, input_mean)
        preds = model.apply(variables, images, train=False)
        logits = preds[0] if isinstance(preds, (tuple, list)) else preds
        up = resize_bilinear_align_corners(logits.astype(jnp.float32), out_size)
        pred = jnp.argmax(up, axis=-1).astype(jnp.uint8)  # (B, OH, OW)
        in_bounds = (
            (jnp.arange(out_size[0])[None, :, None] < hs[:, None, None])
            & (jnp.arange(out_size[1])[None, None, :] < ws[:, None, None])
        )
        labels = jnp.where(in_bounds, labels, ignore_label)
        conf = confusion_matrix(pred, labels, num_classes, ignore_label)
        return pred, conf

    return run


def make_msf_val_batch_fn(model, out_size: Tuple[int, int], num_classes: int,
                          scales: Tuple[float, ...], flip: bool,
                          ignore_label: int = 255, input_mean=None) -> Callable:
    """Batched multiscale+flip eval: the fused msf program of
    `make_msf_val_fn` over a WHOLE group of images per dispatch. With the
    batch sharded on the mesh's data axis each device runs every scale for
    its own images, so the expensive published-eval mode (3 scales + flip =
    6 forwards/image) divides by the data-parallel degree."""
    scales = tuple(scales)

    @jax.jit
    def run(variables, images: jnp.ndarray, labels: jnp.ndarray,
            hs: jnp.ndarray, ws: jnp.ndarray):
        x = _dequantize_wire(images, input_mean).astype(jnp.float32)
        ih, iw = x.shape[1], x.shape[2]

        def fwd(xin):
            preds = model.apply(variables, xin, train=False)
            logits = preds[0] if isinstance(preds, (tuple, list)) else preds
            return resize_bilinear_align_corners(
                logits.astype(jnp.float32), out_size)

        total = None
        for s in scales:
            if s == 1.0:
                xs = x
            else:
                xs = resize_bilinear_align_corners(
                    x, (int(round(ih * s)), int(round(iw * s))))
            up = fwd(xs)
            if flip:
                upf = fwd(xs[:, :, ::-1, :])
                up = 0.5 * (up + upf[:, :, ::-1, :])
            total = up if total is None else total + up
        pred = jnp.argmax(total, axis=-1).astype(jnp.uint8)  # (B, OH, OW)
        in_bounds = (
            (jnp.arange(out_size[0])[None, :, None] < hs[:, None, None])
            & (jnp.arange(out_size[1])[None, None, :] < ws[:, None, None])
        )
        labels = jnp.where(in_bounds, labels, ignore_label)
        conf = confusion_matrix(pred, labels, num_classes, ignore_label)
        return pred, conf

    return run


@functools.lru_cache(maxsize=32)
def _cached_msf_batch_fn(model, out_size, num_classes, scales, flip,
                         ignore_label, mean_tuple):
    mean = np.asarray(mean_tuple, np.float32) if mean_tuple is not None else None
    return make_msf_val_batch_fn(model, out_size, num_classes, scales, flip,
                                 ignore_label, input_mean=mean)


def evaluate_sharded(
    model,
    variables,
    loader: Iterable,
    num_classes: int,
    out_size: Tuple[int, int] = (1024, 2048),
    batch: int = 8,
    sharding=None,
    ignore_label: int = 255,
    input_mean=None,
    scales: Tuple[float, ...] = (1.0,),
    flip: bool = False,
):
    """Data-parallel whole-image val sweep (no PNGs). Default = the fast
    in-training path (one scale, no flip); `scales`/`flip` switch each group
    dispatch to the fused multiscale+flip program. Groups `batch` images per
    dispatch; the tail group is padded with masked slots. Returns
    (mean_IU, IU_array) like `evaluate_main`. `input_mean` enables the u8
    image wire (see make_fast_val_fn)."""
    scales = tuple(scales)
    if scales == (1.0,) and not flip:
        fn = _cached_eval_fn(make_fast_val_batch_fn, model, tuple(out_size),
                             num_classes, ignore_label, _mean_key(input_mean))
    else:
        fn = _cached_msf_batch_fn(model, tuple(out_size), num_classes, scales,
                                  bool(flip), ignore_label,
                                  _mean_key(input_mean))
    conf = np.zeros((num_classes, num_classes), np.float64)
    conf_dev_acc = None
    buf = []
    narrow_labels = num_classes <= 254 and ignore_label <= 255

    def flush():
        nonlocal conf_dev_acc
        if not buf:
            return
        n = len(buf)
        pad = batch - n
        images = np.stack([b[0] for b in buf] + [buf[-1][0]] * pad)
        labels = np.stack([b[1] for b in buf] + [buf[-1][1]] * pad)
        if input_mean is not None:
            images = _quantize_wire(images, input_mean)
        if narrow_labels:
            labels = labels.astype(np.uint8)
        hs = np.array([b[2] for b in buf] + [0] * pad, np.int32)
        ws = np.array([b[3] for b in buf] + [0] * pad, np.int32)
        if sharding is not None:
            images = jax.device_put(images, sharding)
            labels = jax.device_put(labels, sharding)
        _, conf_dev = fn(variables, images, labels, jnp.asarray(hs),
                         jnp.asarray(ws))
        # device-side accumulation: no per-group fetch fence (see
        # evaluate_main), one transfer at the end of the sweep
        conf_dev_acc = conf_dev if conf_dev_acc is None else conf_dev_acc + conf_dev
        buf.clear()

    for item in loader:
        image, label, size, _ = item
        # loader yields batch-1 items; regroup to the device batch
        for i in range(image.shape[0]):
            h, w = int(size[i][0]), int(size[i][1])
            buf.append((np.asarray(image[i]), np.asarray(label[i]), h, w))
            if len(buf) == batch:
                flush()
    flush()
    if conf_dev_acc is not None:
        conf += np.asarray(conf_dev_acc, np.float64)
    return iu_from_confusion(conf)


def evaluate_spatial(
    model,
    variables,
    loader: Iterable,
    num_classes: int,
    out_size: Tuple[int, int] = (1024, 2048),
    mesh=None,
    ignore_label: int = 255,
    input_mean=None,
):
    """Whole-image val sweep with the image HEIGHT sharded across the mesh's
    data axis — the TPU-native replacement for memory-bounded tiled
    inference (reference predict_sliding, networks/evaluate.py:70-104).

    One jitted pass per image: XLA partitions every conv spatially and
    inserts the 3×3-halo exchanges itself, so the activation footprint
    divides by the device count while the numerics stay EXACTLY the
    whole-image ones (no tile overlap averaging). Confusion accumulates on
    device like the other sweeps."""
    from structure_knowledge_distillation_tpu.parallel import spatial_sharding

    sh = spatial_sharding(mesh)
    # XLA argmax path: a Pallas custom call cannot be SPMD-partitioned over
    # the spatially sharded inputs
    fn = _cached_eval_fn(_fast_val_fn_xla, model, tuple(out_size),
                         num_classes, ignore_label, _mean_key(input_mean))
    conf_dev_acc = None
    for image, label, size, _ in loader:
        h, w = int(size[0][0]), int(size[0][1])
        if input_mean is not None:
            image = _quantize_wire(image, input_mean)
        lab0 = np.asarray(label[0])
        if num_classes <= 254 and ignore_label <= 255:
            lab0 = lab0.astype(np.uint8)
        image = jax.device_put(np.asarray(image), sh)
        # label (H, W): H sharded over the same axes as the image height
        lab_sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(sh.spec[1]))
        lab0 = jax.device_put(lab0, lab_sh)
        _, conf_dev = fn(variables, image, lab0, jnp.int32(h), jnp.int32(w))
        conf_dev_acc = (conf_dev if conf_dev_acc is None
                        else conf_dev_acc + conf_dev)
    conf = np.asarray(conf_dev_acc, np.float64) if conf_dev_acc is not None \
        else np.zeros((num_classes, num_classes))
    return iu_from_confusion(conf)


def make_msf_val_fn(model, out_size: Tuple[int, int], num_classes: int,
                    scales: Tuple[float, ...], flip: bool,
                    ignore_label: int = 255, input_mean=None) -> Callable:
    """Multiscale + flip whole-image eval fused into ONE device program.

    The reference's predict_multiscale (networks/evaluate.py:115-134) zooms
    the input on the host (scipy, order=1 == align-corners bilinear — see
    losses/ohem.py) and pulls the full-resolution logits back per scale: at
    Cityscapes full res that is 159 MB device→host PER SCALE per image,
    plus host-side zoom and argmax. Here every scale's forward, the flip
    average, the cross-scale sum, the argmax, and the confusion matrix run
    on device — only the uint8 prediction (2 MB) and the (C,C) counts come
    back. Scale factors are static, so the whole sweep is one jit.

    Implemented as the batched msf program at B=1 (one copy of the
    parity-sensitive scale-sizing math, reference evaluate.py:127).
    """
    batch_run = make_msf_val_batch_fn(model, out_size, num_classes, scales,
                                      flip, ignore_label, input_mean)

    def run(variables, image: jnp.ndarray, label: jnp.ndarray,
            h: jnp.ndarray, w: jnp.ndarray):
        pred, conf = batch_run(variables, image, label[None],
                               jnp.reshape(h, (1,)), jnp.reshape(w, (1,)))
        return pred[0], conf

    return run


@functools.lru_cache(maxsize=32)
def _cached_msf_fn(model, out_size, num_classes, scales, flip, ignore_label,
                   mean_tuple):
    mean = np.asarray(mean_tuple, np.float32) if mean_tuple is not None else None
    return make_msf_val_fn(model, out_size, num_classes, scales, flip,
                           ignore_label, input_mean=mean)


def make_sliding_val_fn(model, out_size: Tuple[int, int],
                        tile_size: Tuple[int, int], num_classes: int,
                        ignore_label: int = 255, input_mean=None,
                        overlap: float = 1.0 / 3.0) -> Callable:
    """Overlapping-tile inference fused into ONE device program.

    The tile grid for a fixed (out_size, tile_size, overlap) is static, so
    every tile forward, the upsample-to-tile, the overlap accumulation, the
    count normalization, the argmax, and the confusion run in one jit —
    the host path fetches (tile²·C) f32 logits per tile (~300 MB per
    full-res Cityscapes image). Accumulation is f32 (the host path used
    float64; ≤4 overlapping tiles of O(10) logits need nowhere near it, and
    the count division cancels in the argmax anyway).
    Geometry matches `predict_sliding` / reference networks/evaluate.py:70-104.
    """
    th, tw = tile_size
    H, W = out_size
    stride = ceil(th * (1.0 - overlap))
    rows = int(ceil(max(H - th, 0) / stride) + 1)
    cols = int(ceil(max(W - tw, 0) / stride) + 1)

    @jax.jit
    def run(variables, image: jnp.ndarray, label: jnp.ndarray,
            h: jnp.ndarray, w: jnp.ndarray):
        x = _dequantize_wire(image, input_mean).astype(jnp.float32)
        full = jnp.zeros((H, W, num_classes), jnp.float32)
        cnt = jnp.zeros((H, W, 1), jnp.float32)
        for r in range(rows):
            for c in range(cols):
                x1, y1 = int(c * stride), int(r * stride)
                x2, y2 = min(x1 + tw, W), min(y1 + th, H)
                x1, y1 = max(x2 - tw, 0), max(y2 - th, 0)
                tile = x[:, y1:y2, x1:x2, :]
                pad_h, pad_w = th - (y2 - y1), tw - (x2 - x1)
                if pad_h or pad_w:
                    tile = jnp.pad(tile,
                                   ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
                preds = model.apply(variables, tile, train=False)
                logits = preds[0] if isinstance(preds, (tuple, list)) else preds
                up = resize_bilinear_align_corners(
                    logits.astype(jnp.float32), (th, tw))[0]
                full = full.at[y1:y2, x1:x2].add(up[: y2 - y1, : x2 - x1])
                cnt = cnt.at[y1:y2, x1:x2].add(1.0)
        pred = jnp.argmax(full / cnt, axis=-1).astype(jnp.uint8)
        in_bounds = (jnp.arange(H)[:, None] < h) & (jnp.arange(W)[None, :] < w)
        label = jnp.where(in_bounds, label, ignore_label)
        conf = confusion_matrix(pred, label, num_classes, ignore_label)
        return pred, conf

    return run


@functools.lru_cache(maxsize=32)
def _cached_sliding_fn(model, out_size, tile_size, num_classes, ignore_label,
                       mean_tuple):
    mean = np.asarray(mean_tuple, np.float32) if mean_tuple is not None else None
    return make_sliding_val_fn(model, out_size, tile_size, num_classes,
                               ignore_label, input_mean=mean)


def predict_sliding(
    predict_tile: Callable,
    image: np.ndarray,
    tile_size: Tuple[int, int],
    num_classes: int,
    overlap: float = 1.0 / 3.0,
) -> np.ndarray:
    """Overlapping-tile inference (reference :70-104). image: (1, H, W, 3)."""
    _, h, w, _ = image.shape
    th, tw = tile_size
    stride = ceil(th * (1.0 - overlap))
    rows = int(ceil(max(h - th, 0) / stride) + 1)
    cols = int(ceil(max(w - tw, 0) / stride) + 1)
    full = np.zeros((h, w, num_classes), np.float64)
    cnt = np.zeros((h, w, 1), np.float64)
    for r in range(rows):
        for c in range(cols):
            x1, y1 = int(c * stride), int(r * stride)
            x2, y2 = min(x1 + tw, w), min(y1 + th, h)
            x1, y1 = max(x2 - tw, 0), max(y2 - th, 0)
            tile = image[:, y1:y2, x1:x2, :]
            pad_h, pad_w = th - tile.shape[1], tw - tile.shape[2]
            if pad_h or pad_w:
                tile = np.pad(tile, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            logits = np.asarray(predict_tile(tile))[0]
            full[y1:y2, x1:x2] += logits[: y2 - y1, : x2 - x1]
            cnt[y1:y2, x1:x2] += 1
    return full / cnt


def predict_multiscale(
    predict_whole: Callable,
    image: np.ndarray,
    scales: Iterable[float] = (1.0,),
    flip: bool = False,
) -> np.ndarray:
    """Average logits over image scales, optional flip-average (reference :115-134)."""
    from scipy import ndimage

    total = None
    scales = list(scales)
    for scale in scales:
        if scale == 1.0:
            scaled = image
        else:
            scaled = ndimage.zoom(image, (1.0, scale, scale, 1.0), order=1, prefilter=False)
        probs = np.asarray(predict_whole(scaled))[0]
        if flip:
            flipped = np.asarray(predict_whole(scaled[:, :, ::-1, :]))[0]
            probs = 0.5 * (probs + flipped[:, ::-1, :])
        total = probs if total is None else total + probs
    return total / len(scales)


def evaluate_main(
    model,
    variables,
    loader: Iterable,
    num_classes: int,
    out_size: Tuple[int, int] = (1024, 2048),
    eval_type: str = "val",
    output_dir: Optional[str] = None,
    whole: bool = True,
    tile_size: Tuple[int, int] = (512, 512),
    scales: Iterable[float] = (1.0,),
    flip: bool = False,
    ignore_label: int = 255,
    remap_train_ids: bool = True,
    input_mean=None,
):
    """Returns (mean_IU, IU_array) for 'val'; writes PNGs if output_dir set.

    `input_mean` (fast path only) switches the host→device image transfer to
    re-quantized uint8 — exact for unscaled/unpadded val frames, 4× less
    traffic (see make_fast_val_fn)."""
    scales = tuple(scales)
    fast_path = (whole and scales == (1.0,) and not flip and eval_type == "val")
    # any other whole-image sweep (multiscale and/or flip, val or test) runs
    # the device-fused program: no host zoom, no per-scale logits transfer
    msf_path = whole and not fast_path
    if fast_path:
        fast_fn = _cached_eval_fn(make_fast_val_fn, model, tuple(out_size),
                                  num_classes, ignore_label,
                                  _mean_key(input_mean))
    elif msf_path:
        msf_fn = _cached_msf_fn(model, tuple(out_size), num_classes, scales,
                                bool(flip), ignore_label,
                                _mean_key(input_mean))
    else:
        # sliding tiles upsample to TILE size before accumulation (reference
        # evaluate.py:71 interp = Upsample(size=tile_size)), NOT to the full
        # output size; the whole tile sweep is one fused device program
        sliding_fn = _cached_sliding_fn(model, tuple(out_size),
                                        tuple(tile_size), num_classes,
                                        ignore_label, _mean_key(input_mean))

    conf = np.zeros((num_classes, num_classes), np.float64)
    # fast path: accumulate confusion ON DEVICE and fetch once at the end —
    # a per-image fetch fences the async dispatch stream, serializing every
    # image's host→device transfer behind the previous forward (measured:
    # the fence, not the device compute, dominated the full-res sweep wall)
    conf_dev_acc = None
    for batch in loader:
        if eval_type == "val":
            image, label, size, name = batch
        else:
            image, size, name = batch
            label = None

        if fast_path:
            h, w = int(size[0][0]), int(size[0][1])
            if input_mean is not None:
                image = _quantize_wire(image, input_mean)
            lab0 = np.asarray(label[0])
            if num_classes <= 254 and ignore_label <= 255:
                lab0 = lab0.astype(np.uint8)
            pred_dev, conf_dev = fast_fn(variables, jnp.asarray(image),
                                         jnp.asarray(lab0),
                                         jnp.int32(h), jnp.int32(w))
            conf_dev_acc = (conf_dev if conf_dev_acc is None
                            else conf_dev_acc + conf_dev)
            if output_dir is not None:
                seg_pred = np.asarray(pred_dev)
                from PIL import Image as PILImage

                os.makedirs(output_dir, exist_ok=True)
                im = PILImage.fromarray(seg_pred)
                im.putpalette(get_palette(256))
                im.save(os.path.join(output_dir, f"{name[0]}.png"))
            continue

        # both remaining paths (msf whole-image, sliding tiles) are fused
        # device programs with the same (pred, conf) interface
        if label is not None:
            h, w = int(size[0][0]), int(size[0][1])
            lab0 = np.asarray(label[0])
        else:  # test sweep: no labels; the confusion output is discarded
            h, w = out_size
            lab0 = np.zeros(out_size, np.uint8)
        if input_mean is not None:
            image = _quantize_wire(image, input_mean)
        if num_classes <= 254 and ignore_label <= 255:
            lab0 = lab0.astype(np.uint8)
        run_fn = msf_fn if msf_path else sliding_fn
        pred_dev, conf_dev = run_fn(variables, jnp.asarray(image),
                                    jnp.asarray(lab0),
                                    jnp.int32(h), jnp.int32(w))
        if eval_type == "val":
            conf_dev_acc = (conf_dev if conf_dev_acc is None
                            else conf_dev_acc + conf_dev)

        if output_dir is not None:
            seg_pred = np.asarray(pred_dev)  # only fence when writing PNGs
            from PIL import Image as PILImage

            from structure_knowledge_distillation_tpu.data.cityscapes import trainid2id

            os.makedirs(output_dir, exist_ok=True)
            out = (trainid2id(seg_pred)
                   if eval_type == "test" and remap_train_ids else seg_pred)
            im = PILImage.fromarray(out)
            im.putpalette(get_palette(256))
            im.save(os.path.join(output_dir, f"{name[0]}.png"))

    if conf_dev_acc is not None:
        conf += np.asarray(conf_dev_acc, np.float64)
    if eval_type == "val":
        return iu_from_confusion(conf)
    return None, None
