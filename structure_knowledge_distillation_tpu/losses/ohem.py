"""OHEM cross-entropy — hard-example mining, redesigned to be jittable.

The reference (utils/criterion.py:11-90, OhemCrossEntropy2d) round-trips to
host numpy/scipy per step: it 1/8-downsamples predictions (scipy zoom),
np.partition-selects a probability threshold so that at least
min_kept/factor² hardest valid pixels survive, then masks full-resolution
pixels whose ground-truth-class probability exceeds the threshold.

Here the same selection runs on-device with static shapes:
  * downsampling is strided/bilinear via jnp (no host sync),
  * the k-th smallest valid probability comes from a sort (k is static),
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

    # --- threshold search on the 1/factor grid (reference find_threshold)
    ds_prob = gt_prob[:, ::factor, ::factor]
    ds_valid = valid_full[:, ::factor, ::factor]
    k = max(min_kept // (factor * factor), 0)
    num_valid = jnp.sum(ds_valid)

    flat = jnp.where(ds_valid, ds_prob, jnp.inf).ravel()
    k_eff = min(max(k, 1), flat.size) - 1
    kth_value = jnp.sort(flat)[k_eff]
    threshold = jnp.maximum(jnp.float32(thresh), kth_value)
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
