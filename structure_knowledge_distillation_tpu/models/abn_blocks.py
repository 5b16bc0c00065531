"""Extra ABN-family building blocks (reference libs/misc.py, libs/dense.py,
libs/residual.py — shipped with the inplace_abn library; not used by the KD
pipeline, provided for library parity).

TPU-native forms: NHWC, `ABN` sync batch-norm, channel-last concatenation.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from structure_knowledge_distillation_tpu.ops.batch_norm import ABN

__all__ = ["GlobalAvgPool2d", "DenseModule", "IdentityResidualBlock"]


class GlobalAvgPool2d(nn.Module):
    """(N,H,W,C) -> (N,C) mean pool (reference libs/misc.py)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean(x, axis=(1, 2))


class DenseModule(nn.Module):
    """DenseNet-style module (reference libs/dense.py): `layers` stages of
    BN→1×1 conv (bottleneck) → BN→3×3 conv (growth), concatenating features."""

    growth: int
    layers: int
    bottleneck_factor: int = 4
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dilation
        for i in range(self.layers):
            h = ABN(activation="leaky_relu", axis_name=self.axis_name,
                    name=f"bn1_{i}")(x, not train)
            h = nn.Conv(self.growth * self.bottleneck_factor, (1, 1),
                        use_bias=False, dtype=self.dtype, name=f"conv1_{i}")(h)
            h = ABN(activation="leaky_relu", axis_name=self.axis_name,
                    name=f"bn2_{i}")(h, not train)
            h = nn.Conv(self.growth, (3, 3), padding=((d, d), (d, d)),
                        kernel_dilation=(d, d), use_bias=False,
                        dtype=self.dtype, name=f"conv2_{i}")(h)
            x = jnp.concatenate([x, h], axis=-1)
        return x

    @property
    def out_channels_added(self) -> int:
        return self.growth * self.layers


class IdentityResidualBlock(nn.Module):
    """Pre-activation (identity-mapping) residual block (reference
    libs/residual.py): 2-conv or 3-conv variant chosen by len(channels)."""

    channels: Sequence[int]  # (mid, out) or (mid1, mid2, out)
    stride: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if len(self.channels) not in (2, 3):
            raise ValueError("channels must have length 2 or 3")
        in_ch = x.shape[-1]
        need_proj = self.stride != 1 or in_ch != self.channels[-1]
        d = self.dilation

        pre = ABN(activation="leaky_relu", axis_name=self.axis_name,
                  name="bn1")(x, not train)
        shortcut = x
        if need_proj:
            shortcut = nn.Conv(self.channels[-1], (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="proj_conv")(pre)

        if len(self.channels) == 2:
            h = nn.Conv(self.channels[0], (3, 3), strides=(self.stride,) * 2,
                        padding=((d, d), (d, d)), kernel_dilation=(d, d),
                        use_bias=False, dtype=self.dtype, name="conv1")(pre)
            h = ABN(activation="leaky_relu", axis_name=self.axis_name,
                    name="bn2")(h, not train)
            h = nn.Conv(self.channels[1], (3, 3), padding=((d, d), (d, d)),
                        kernel_dilation=(d, d), use_bias=False,
                        dtype=self.dtype, name="conv2")(h)
        else:
            h = nn.Conv(self.channels[0], (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype, name="conv1")(pre)
            h = ABN(activation="leaky_relu", axis_name=self.axis_name,
                    name="bn2")(h, not train)
            h = nn.Conv(self.channels[1], (3, 3), padding=((d, d), (d, d)),
                        kernel_dilation=(d, d), use_bias=False,
                        dtype=self.dtype, name="conv2")(h)
            h = ABN(activation="leaky_relu", axis_name=self.axis_name,
                    name="bn3")(h, not train)
            h = nn.Conv(self.channels[2], (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv3")(h)
        return h + shortcut
