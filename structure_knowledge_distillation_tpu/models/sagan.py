"""SAGAN-style discriminator for the holistic (Ho) distillation loss.

Re-designed from the behavior of reference networks/sagan_models.py:105-168:
four spectral-norm stride-2 4×4 convs (C→64→128→256→512) with LeakyReLU(0.1),
self-attention at 256 and 512 channels, and a final 4×4 valid conv to a
(B,1,1,1) score. The input is the 19-channel stride-8 segmentation score map
(65×65 for 512² crops); `image_size == 65` gates the fourth conv block
(reference :131-136). Input preprocessing modes: 1 = BatchNorm2d, 2 = tanh,
3 = affine rescale of a [0,255] input (reference :147-154).

The attention bmm/softmax is left to XLA (64-256 spatial positions — far too
small for a hand-rolled kernel to beat the fused XLA path).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from structure_knowledge_distillation_tpu.ops.batch_norm import BatchNorm2d
from structure_knowledge_distillation_tpu.ops.spectral import SNConv

__all__ = ["SelfAttention", "Discriminator"]


class SelfAttention(nn.Module):
    """Self-attention over spatial positions (reference sagan_models.py:9-41).

    out = gamma * (softmax(QᵀK) applied to V) + x, gamma initialized to 0.
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        n, h, w, c = x.shape
        conv = lambda feats, name: nn.Conv(feats, (1, 1), use_bias=True, dtype=self.dtype, name=name)
        q = conv(c // 8, "query_conv")(x).reshape(n, h * w, c // 8)
        k = conv(c // 8, "key_conv")(x).reshape(n, h * w, c // 8)
        v = conv(c, "value_conv")(x).reshape(n, h * w, c)
        # energy[b, i, j] = q_i · k_j ; attention over j
        energy = jnp.einsum("bic,bjc->bij", q, k)
        attention = nn.softmax(energy.astype(jnp.float32), axis=-1).astype(energy.dtype)
        out = jnp.einsum("bij,bjc->bic", attention, v).reshape(n, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x, attention


class Discriminator(nn.Module):
    """Spectral-norm conditional discriminator over segmentation score maps."""

    preprocess_mode: int = 1  # 1: batch-norm, 2: tanh, 3: scale [0,255] -> [-1,1]
    image_size: int = 65
    conv_dim: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        if self.preprocess_mode == 1:
            x = BatchNorm2d(name="preprocess_bn")(x, use_running_average=not train)
        elif self.preprocess_mode == 2:
            x = jnp.tanh(x)
        elif self.preprocess_mode == 3:
            x = 2.0 * (x / 255.0 - 0.5)
        else:
            raise ValueError("preprocess_mode should be 1 (bn), 2 (tanh) or 3 (scale)")

        lrelu = lambda t: nn.leaky_relu(t, negative_slope=0.1)
        sn = lambda feats, name: SNConv(feats, (4, 4), (2, 2), (1, 1), dtype=self.dtype, name=name)

        out = lrelu(sn(self.conv_dim, "l1")(x, update_stats=train))
        out = lrelu(sn(self.conv_dim * 2, "l2")(out, update_stats=train))
        out = lrelu(sn(self.conv_dim * 4, "l3")(out, update_stats=train))
        out, p1 = SelfAttention(dtype=self.dtype, name="attn1")(out)
        if self.image_size == 65:
            out = lrelu(sn(self.conv_dim * 8, "l4")(out, update_stats=train))
        out, p2 = SelfAttention(dtype=self.dtype, name="attn2")(out)
        out = nn.Conv(1, (4, 4), strides=(1, 1), padding="VALID", use_bias=True,
                      dtype=self.dtype, name="last")(out)
        return out.astype(jnp.float32), p1, p2
