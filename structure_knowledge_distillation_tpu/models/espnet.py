"""ESPNet / ESPNet-C student (Mehta et al., ECCV'18) — TPU-native.

The reference README's CamVid rows distill an ESPNet student with this
repo's losses (reference README.md:12-18; the ESPNet code itself lived in an
external repo). To make the CamVid transfer a first-class config here, the
ESPNet-C encoder is implemented natively: efficient spatial pyramid (ESP)
modules — pointwise reduction → K parallel dilated 3×3 convs (d = 1,2,4,8,16)
→ hierarchical feature fusion (HFF) — with input reinforcement at each
downsampling level, batch-norm via the sync `ABN` layer and PReLU activation.

The forward honors the KD 7-tuple contract (stride-8 logits first, the
pre-classifier feature at index 2 / −5 for the pairwise loss).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from structure_knowledge_distillation_tpu.ops.batch_norm import ABN

__all__ = ["ESPNetC"]


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.constant(0.25), (c,), jnp.float32)
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


def _conv(features, kernel, stride=1, dilation=1, name=None, dtype=None):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   kernel_dilation=(dilation, dilation), use_bias=False,
                   dtype=dtype, name=name)


class CBR(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = _conv(self.features, self.kernel, self.stride, dtype=self.dtype, name="conv")(x)
        x = ABN(activation="none", axis_name=self.axis_name, name="bn")(x, not train)
        return PReLU(name="act")(x)


class BR(nn.Module):
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = ABN(activation="none", axis_name=self.axis_name, name="bn")(x, not train)
        return PReLU(name="act")(x)


class ESP(nn.Module):
    """Efficient spatial pyramid block with hierarchical feature fusion."""

    features: int
    stride: int = 1
    dilations: Sequence[int] = (1, 2, 4, 8, 16)
    add_residual: bool = True
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        k = len(self.dilations)
        d = self.features // k
        d1 = self.features - d * (k - 1)  # first branch absorbs the remainder
        widths = [d1] + [d] * (k - 1)

        reduced = _conv(d1 if self.stride == 1 else d1, 3 if self.stride == 2 else 1,
                        self.stride, dtype=self.dtype, name="reduce")(x)
        branches = []
        for i, dil in enumerate(self.dilations):
            b = _conv(widths[i], 3, 1, dil, dtype=self.dtype, name=f"spp_{i}")(reduced)
            branches.append(b)
        # HFF: de-gridding by cumulative sums across pyramid levels
        fused = [branches[0]]
        for i in range(1, k):
            prev = fused[-1]
            add = prev[..., -widths[i]:] if prev.shape[-1] != widths[i] else prev
            fused.append(branches[i] + add)
        out = jnp.concatenate(fused, axis=-1)
        if self.add_residual and self.stride == 1 and out.shape == x.shape:
            out = out + x
        out = ABN(activation="none", axis_name=self.axis_name, name="bn")(out, not train)
        return PReLU(name="act")(out)


def _downsample_input(x: jnp.ndarray, times: int) -> jnp.ndarray:
    """Average-pool the raw input by 2^times (input reinforcement)."""
    import jax

    for _ in range(times):
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        ) / 9.0
    return x


class ESPNetC(nn.Module):
    """ESPNet-C encoder + 1×1 classifier (stride-8 logits).

    p = blocks at level 2, q = blocks at level 3 (paper defaults 2 / 8;
    use smaller q for the CamVid student if desired).
    """

    num_classes: int = 11
    p: int = 2
    q: int = 8
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        inp = x
        l1 = CBR(16, 3, 2, self.axis_name, self.dtype, name="level1")(x, train)
        inp2 = _downsample_input(inp, 1)
        l1c = BR(self.axis_name, name="br1")(jnp.concatenate([l1, inp2], -1), train)

        l2_down = ESP(64, stride=2, add_residual=False, axis_name=self.axis_name,
                      dtype=self.dtype, name="level2_down")(l1c, train)
        h = l2_down
        for i in range(self.p):
            h = ESP(64, axis_name=self.axis_name, dtype=self.dtype,
                    name=f"level2_{i}")(h, train)
        inp4 = _downsample_input(inp, 2)
        l2c = BR(self.axis_name, name="br2")(
            jnp.concatenate([h, l2_down, inp4], -1), train)

        l3_down = ESP(128, stride=2, add_residual=False, axis_name=self.axis_name,
                      dtype=self.dtype, name="level3_down")(l2c, train)
        h = l3_down
        for i in range(self.q):
            h = ESP(128, axis_name=self.axis_name, dtype=self.dtype,
                    name=f"level3_{i}")(h, train)
        l3c = BR(self.axis_name, name="br3")(jnp.concatenate([h, l3_down], -1), train)

        feat = l3c  # (N, H/8, W/8, 256)
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
                         name="classifier")(feat)
        aux = nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
                      name="aux_classifier")(l2c)
        # 7-tuple KD contract: aux head sits at stride 4 (level-2 concat);
        # outputs stay in the compute dtype (losses cast where they accumulate)
        return (logits, aux, feat, l3c, l2c, l1c, l1)
