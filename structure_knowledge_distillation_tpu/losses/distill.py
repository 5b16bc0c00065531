"""Structured distillation losses: pixel-wise KL (Pi) and pairwise affinity (Pa).

Pixel-wise (reference utils/criterion.py:211-226): cross-entropy between the
teacher's softmax and the student's log-softmax over the raw stride-8 logits,
summed over batch/pixels/classes and divided by the spatial size only (NOT by
batch — kept exactly, since the published lambda_pi=10.0 is calibrated to it).

Pairwise (reference utils/criterion.py:228-245 + utils/utils.py:170-183):
ceil-mode max-pool the post-PSP feature map down by `scale`, channel-L2-
normalize (norm is stop-gradient'd, +1e-8), form the B×N×N Gram/affinity
matrix, and take sum((G_T − G_S)²) / N² / B. The Gram einsum is a large dense
batched matmul — pure MXU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from structure_knowledge_distillation_tpu.ops.pooling import max_pool_2d

__all__ = ["pixel_wise_kl", "similarity_gram", "sim_dis_compute", "pairwise_affinity_loss"]


def pixel_wise_kl(logits_s: jnp.ndarray, logits_t: jnp.ndarray) -> jnp.ndarray:
    """sum(-softmax(T) · logsoftmax(S)) / (H*W). NHWC logits."""
    assert logits_s.shape == logits_t.shape, (
        f"student/teacher logits differ: {logits_s.shape} vs {logits_t.shape}"
    )
    n, h, w, c = logits_s.shape
    p_t = jax.nn.softmax(jax.lax.stop_gradient(logits_t).astype(jnp.float32), axis=-1)
    logp_s = jax.nn.log_softmax(logits_s.astype(jnp.float32), axis=-1)
    return jnp.sum(-p_t * logp_s) / (h * w)


def similarity_gram(feat: jnp.ndarray) -> jnp.ndarray:
    """B×N×N affinity of channel-normalized features (reference utils.py:173-178).

    feat: (N,H,W,C). The channel norm is stop-gradient'd, matching the
    reference's `L2(feat).detach()`.
    """
    f = feat.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True)) + 1e-8
    f = f / jax.lax.stop_gradient(norm)
    n, h, w, c = f.shape
    f = f.reshape(n, h * w, c)
    return jnp.einsum("bmc,bnc->bmn", f, f)


def sim_dis_compute(feat_s: jnp.ndarray, feat_t: jnp.ndarray) -> jnp.ndarray:
    """sum((G_T − G_S)²) / (H*W)² / B on NHWC features (reference utils.py:180-183)."""
    n, h, w, _ = feat_t.shape
    diff = similarity_gram(jax.lax.stop_gradient(feat_t)) - similarity_gram(feat_s)
    return jnp.sum(jnp.square(diff)) / ((h * w) ** 2) / n


def pairwise_affinity_loss(
    feat_s: jnp.ndarray, feat_t: jnp.ndarray, scale: float = 0.5
) -> jnp.ndarray:
    """Pa loss: ceil-mode max-pool both features by `scale`, then affinity L2.

    Kernel/stride = int(dim * scale) per spatial dim (reference
    criterion.py:241-243) — 65×65 features with scale 0.5 pool to 3×3.
    """
    h, w = feat_t.shape[1], feat_t.shape[2]
    kh, kw = int(h * scale), int(w * scale)
    pool = lambda f: max_pool_2d(f, (kh, kw), (kh, kw), (0, 0), ceil_mode=True)
    return sim_dis_compute(pool(feat_s), pool(feat_t))
