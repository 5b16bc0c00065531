"""Task (segmentation) losses: DSN cross-entropy with ignore-index.

Semantics of reference utils/criterion.py:168-188 (CriterionDSN): both the
main and the auxiliary (DSN) logits are bilinearly upsampled (align-corners)
to the label resolution, cross-entropy ignores label 255 and averages over
non-ignored pixels, total = main + 0.4 * aux.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from structure_knowledge_distillation_tpu.ops.resize import resize_bilinear_align_corners

__all__ = ["cross_entropy_ignore", "criterion_dsn"]


def cross_entropy_ignore(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255
) -> jnp.ndarray:
    """Mean CE over non-ignored pixels. logits (N,H,W,C) f32, labels (N,H,W) int."""
    labels = labels.astype(jnp.int32)
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(mask, ce, 0.0))
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def criterion_dsn(
    preds: tuple, labels: jnp.ndarray, ignore_index: int = 255, dsn_weight: float = 0.4
) -> jnp.ndarray:
    """DSN loss: CE(main ↑ label-size) + dsn_weight * CE(aux ↑ label-size)."""
    h, w = labels.shape[1], labels.shape[2]
    main = resize_bilinear_align_corners(preds[0].astype(jnp.float32), (h, w))
    aux = resize_bilinear_align_corners(preds[1].astype(jnp.float32), (h, w))
    return (
        cross_entropy_ignore(main, labels, ignore_index)
        + dsn_weight * cross_entropy_ignore(aux, labels, ignore_index)
    )
