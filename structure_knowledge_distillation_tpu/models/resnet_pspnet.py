"""ResNet-backbone PSPNet — teacher (R101/Bottleneck) and student (R18/Basic).

Re-designed from the behavior of reference networks/pspnet_combine.py:
  * 3-conv stem 3→64→64→128, first conv stride 2 (reference :118-127),
  * ceil-mode 3×3/2 stem max pool (reference :130) — this is what makes 512²
    training crops produce 65×65 (not 64×64) stride-8 feature maps,
  * dilated layer3 (d=2) and layer4 (d=4), output stride 8 (reference :131-134),
  * PSP pyramid pooling over bins (1,2,3,6) (reference :86-112),
  * DSN auxiliary head fed from layer3 (reference :140-155),
  * the forward contract is a 7-tuple
    (logits, dsn_logits, feat_after_psp, x4, x3, x2, x1) (reference :189) that
    the distillation losses index into (pairwise uses feat_after_psp, i.e.
    index 2 == feat_ind −5; reference networks/kd_model.py:82).

TPU-first choices: NHWC layout, optional bfloat16 compute (params stay f32,
BN statistics in f32), adaptive pools and align-corners upsampling expressed
as dense matmuls (MXU), all batch-norm via the `ABN` layer whose statistics
sync across the `data` mesh axis (implicitly under pjit, explicitly via
`axis_name` under shard_map).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from structure_knowledge_distillation_tpu.ops.batch_norm import ABN
from structure_knowledge_distillation_tpu.ops.pooling import adaptive_avg_pool_2d, max_pool_2d
from structure_knowledge_distillation_tpu.ops.resize import resize_bilinear_align_corners

__all__ = [
    "ResPSPNet", "BasicBlock", "Bottleneck", "PSPModule",
    "BASIC", "BOTTLENECK", "teacher_model", "student_model",
]

BASIC = "basic"
BOTTLENECK = "bottleneck"

_KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
          use_bias: bool = False, dtype: Any = None, name: Optional[str] = None) -> nn.Conv:
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=_KERNEL_INIT,
        name=name,
    )


class BasicBlock(nn.Module):
    """Two 3×3 convs + identity (reference pspnet_combine.py:19-45)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    multi_grid: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None
    bn_fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        d = self.dilation * self.multi_grid
        bn = lambda name: ABN(activation="none", axis_name=self.axis_name,
                              fused=self.bn_fused, name=name)
        out = _conv(self.planes, 3, self.stride, d, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out, not train))
        out = _conv(self.planes, 3, 1, d, dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out, not train)
        if self.has_downsample:
            residual = _conv(self.planes, 1, self.stride, dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual, not train)
        else:
            residual = x
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1(×4) bottleneck (reference pspnet_combine.py:47-84)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    multi_grid: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = None
    bn_fused: bool = False

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        d = self.dilation * self.multi_grid
        bn = lambda name: ABN(activation="none", axis_name=self.axis_name,
                              fused=self.bn_fused, name=name)
        out = _conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out, not train))
        out = _conv(self.planes, 3, self.stride, d, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out, not train))
        out = _conv(self.planes * 4, 1, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out, not train)
        if self.has_downsample:
            residual = _conv(self.planes * 4, 1, self.stride, dtype=self.dtype,
                             name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual, not train)
        else:
            residual = x
        return nn.relu(out + residual)


class PSPModule(nn.Module):
    """Pyramid scene parsing pooling head (reference pspnet_combine.py:86-112).

    Each pyramid level is adaptive-avg-pool → 1×1 conv → ABN(leaky_relu) →
    align-corners bilinear upsample back; levels are concatenated with the
    input and bottlenecked by a 3×3 conv + ABN + Dropout2d(0.1).
    """

    out_features: int = 512
    sizes: Sequence[int] = (1, 2, 3, 6)
    axis_name: Optional[str] = None
    dtype: Any = None
    bn_fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        h, w = x.shape[1], x.shape[2]
        priors = []
        for i, size in enumerate(self.sizes):
            p = adaptive_avg_pool_2d(x, (size, size))
            p = _conv(self.out_features, 1, dtype=self.dtype, name=f"stage{i}_conv")(p)
            p = ABN(activation="leaky_relu", axis_name=self.axis_name,
                    fused=self.bn_fused, name=f"stage{i}_bn")(p, not train)
            priors.append(resize_bilinear_align_corners(p, (h, w)))
        priors.append(x)
        y = jnp.concatenate(priors, axis=-1)
        y = _conv(self.out_features, 3, dtype=self.dtype, name="bottleneck_conv")(y)
        y = ABN(activation="leaky_relu", axis_name=self.axis_name,
                fused=self.bn_fused, name="bottleneck_bn")(y, not train)
        y = nn.Dropout(rate=0.1, broadcast_dims=(1, 2), deterministic=not train,
                       name="bottleneck_dropout")(y)
        return y


class ResPSPNet(nn.Module):
    """The combined backbone + PSP + DSN network (reference Res_pspnet).

    block: "bottleneck" (teacher, layers [3,4,23,3]) or "basic" (student,
    layers [2,2,2,2]). Forward returns the 7-tuple feature contract.
    """

    block: str = BOTTLENECK
    layers: Sequence[int] = (3, 4, 23, 3)
    num_classes: int = 19
    axis_name: Optional[str] = None
    dtype: Any = None  # compute dtype for convolutions (e.g. jnp.bfloat16)
    bn_fused: bool = False  # use the Pallas fused ABN kernels

    @property
    def _block_cls(self):
        return Bottleneck if self.block == BOTTLENECK else BasicBlock

    @property
    def _expansion(self) -> int:
        return 4 if self.block == BOTTLENECK else 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        bn = lambda name: ABN(activation="none", axis_name=self.axis_name,
                              fused=self.bn_fused, name=name)
        # Stem: 3 -> 64 -> 64 -> 128, stride 2 then ceil-mode 3x3/2 max pool.
        x = nn.relu(bn("bn1")(_conv(64, 3, 2, dtype=self.dtype, name="conv1")(x), not train))
        x = nn.relu(bn("bn2")(_conv(64, 3, 1, dtype=self.dtype, name="conv2")(x), not train))
        x = nn.relu(bn("bn3")(_conv(128, 3, 1, dtype=self.dtype, name="conv3")(x), not train))
        x = max_pool_2d(x, (3, 3), (2, 2), (1, 1), ceil_mode=True)

        inplanes = 128
        feats = []
        plan = [
            # (planes, stride, dilation)
            (64, 1, 1),
            (128, 2, 1),
            (256, 1, 2),
            (512, 1, 4),
        ]
        for li, ((planes, stride, dilation), blocks) in enumerate(zip(plan, self.layers), start=1):
            for bi in range(blocks):
                has_down = bi == 0 and (stride != 1 or inplanes != planes * self._expansion)
                x = self._block_cls(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation,
                    has_downsample=has_down,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    bn_fused=self.bn_fused,
                    name=f"layer{li}_{bi}",
                )(x, train)
                inplanes = planes * self._expansion
            feats.append(x)

        x1, x2, x3, x4 = feats

        # DSN auxiliary head from layer3.
        dsn_mid = 512 if self.block == BOTTLENECK else 128
        d = _conv(dsn_mid, 3, use_bias=True, dtype=self.dtype, name="dsn_conv1")(x3)
        d = ABN(activation="leaky_relu", axis_name=self.axis_name,
                fused=self.bn_fused, name="dsn_bn")(d, not train)
        d = nn.Dropout(rate=0.1, broadcast_dims=(1, 2), deterministic=not train,
                       name="dsn_dropout")(d)
        x_dsn = _conv(self.num_classes, 1, use_bias=True, dtype=self.dtype, name="dsn_conv2")(d)

        psp_out = 512 if self.block == BOTTLENECK else 128
        x_feat_after_psp = PSPModule(out_features=psp_out, axis_name=self.axis_name,
                                     dtype=self.dtype, bn_fused=self.bn_fused,
                                     name="pspmodule")(x4, train)
        logits = _conv(self.num_classes, 1, use_bias=True, dtype=self.dtype,
                       name="head")(x_feat_after_psp)
        # Outputs stay in the compute dtype; every loss casts to f32 where it
        # accumulates (keeping bf16 here halves loss-path HBM traffic).
        return (logits, x_dsn, x_feat_after_psp, x4, x3, x2, x1)


def teacher_model(num_classes: int = 19, axis_name: Optional[str] = None, dtype: Any = None) -> ResPSPNet:
    return ResPSPNet(block=BOTTLENECK, layers=(3, 4, 23, 3), num_classes=num_classes,
                     axis_name=axis_name, dtype=dtype)


def student_model(num_classes: int = 19, axis_name: Optional[str] = None, dtype: Any = None) -> ResPSPNet:
    return ResPSPNet(block=BASIC, layers=(2, 2, 2, 2), num_classes=num_classes,
                     axis_name=axis_name, dtype=dtype)
