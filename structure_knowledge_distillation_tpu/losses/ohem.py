"""OHEM cross-entropy — hard-example mining, redesigned to be jittable.

The reference (utils/criterion.py:11-90, OhemCrossEntropy2d) round-trips to
host numpy/scipy per step: it 1/8-downsamples predictions (scipy zoom),
np.partition-selects a probability threshold so that at least
min_kept/factor² hardest valid pixels survive, then masks full-resolution
pixels whose ground-truth-class probability exceeds the threshold.

Here the same selection runs on-device with static shapes:
  * the threshold search downsamples the full softmax tensor with
    align-corners bilinear and the labels with align-corners nearest —
    numerically identical to the reference's scipy `zoom(order=1)` /
    `zoom(order=0)` calls (scipy maps output index i to input coordinate
    i·(in−1)/(out−1) with out = round(in/factor); order 0 rounds via
    floor(x+0.5)),
  * the k-th smallest valid probability comes from `lax.top_k` on the
    negated tensor (k is static; O(n·log k), no full sort),
  * the CE is a masked mean over kept pixels.
As in the reference, if fewer than min_kept valid pixels exist the threshold
is 1.0 (keep everything valid), and the threshold never drops below `thresh`.
CriterionOhemDSN combines OHEM on the main head with plain CE on the DSN head
(reference utils/criterion.py:190-209).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from structure_knowledge_distillation_tpu.losses.task import cross_entropy_ignore
from structure_knowledge_distillation_tpu.ops.resize import resize_bilinear_align_corners

__all__ = ["ohem_cross_entropy", "criterion_ohem_dsn"]


def _zoom0_indices(n: int, out: int) -> jnp.ndarray:
    """scipy `zoom(order=0)` source indices: round(i·(n−1)/(out−1))."""
    if out <= 1:
        return jnp.zeros((max(out, 1),), jnp.int32)
    coords = jnp.arange(out, dtype=jnp.float32) * ((n - 1) / (out - 1))
    return jnp.floor(coords + 0.5).astype(jnp.int32)


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    thresh: float = 0.7,
    min_kept: int = 100000,
    factor: int = 8,
) -> jnp.ndarray:
    """Hard-example-mined CE. logits (N,H,W,C) f32, labels (N,H,W) int."""
    labels = labels.astype(jnp.int32)
    n, h, w, c = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    valid_full = labels != ignore_index
    safe_labels = jnp.where(valid_full, labels, 0)
    gt_prob = jnp.take_along_axis(probs, safe_labels[..., None], axis=-1)[..., 0]

    # --- threshold search on the 1/factor grid (reference find_threshold,
    # utils/criterion.py:21-48): bilinear zoom of the softmax tensor +
    # nearest zoom of the labels, both on scipy's align-corners grid.
    out_h, out_w = int(round(h / factor)), int(round(w / factor))
    ds_prob_full = resize_bilinear_align_corners(probs, (out_h, out_w))
    row = _zoom0_indices(h, out_h)
    col = _zoom0_indices(w, out_w)
    ds_labels = labels[:, row][:, :, col]
    ds_valid = ds_labels != ignore_index
    ds_safe = jnp.where(ds_valid, ds_labels, 0)
    ds_prob = jnp.take_along_axis(ds_prob_full, ds_safe[..., None], axis=-1)[..., 0]

    k = max(min_kept // (factor * factor), 0)
    num_valid = jnp.sum(ds_valid)

    if k > 0:
        flat = jnp.where(ds_valid, ds_prob, jnp.inf).ravel()
        kk = min(k, flat.size)
        # k-th smallest via top_k of the negation — O(n·log k) instead of a
        # full O(n·log n) sort of the downsampled tensor. The selection
        # semantics match the reference's host-side np.ndarray.argsort
        # threshold pick (utils/criterion.py:38-45): k-th smallest valid
        # ground-truth probability.
        neg_topk, _ = jax.lax.top_k(-flat, kk)
        kth_value = -neg_topk[kk - 1]
        threshold = jnp.maximum(jnp.float32(thresh), kth_value)
    else:
        # reference: min_kept == 0 leaves threshold at `thresh`
        threshold = jnp.float32(thresh)
    threshold = jnp.where(k >= num_valid, jnp.float32(1.0), threshold)

    kept = valid_full & (gt_prob <= threshold)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(kept, ce, 0.0))
    count = jnp.maximum(jnp.sum(kept), 1)
    return total / count


def criterion_ohem_dsn(
    preds: tuple,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    thresh: float = 0.7,
    min_kept: int = 100000,
    dsn_weight: float = 0.4,
) -> jnp.ndarray:
    h, w = labels.shape[1], labels.shape[2]
    main = resize_bilinear_align_corners(preds[0].astype(jnp.float32), (h, w))
    aux = resize_bilinear_align_corners(preds[1].astype(jnp.float32), (h, w))
    return (
        ohem_cross_entropy(main, labels, ignore_index, thresh, min_kept)
        + dsn_weight * cross_entropy_ignore(aux, labels, ignore_index)
    )
