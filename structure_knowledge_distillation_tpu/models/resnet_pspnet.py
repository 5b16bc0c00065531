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

import jax
import jax.numpy as jnp
from flax import linen as nn

from structure_knowledge_distillation_tpu.ops.batch_norm import ABN
from structure_knowledge_distillation_tpu.ops.pooling import adaptive_avg_pool_2d, max_pool_2d
from structure_knowledge_distillation_tpu.ops.resize import (
    interp_matrix_align_corners,
    resize_bilinear_align_corners,
)

__all__ = [
    "ResPSPNet", "BasicBlock", "Bottleneck", "PSPModule",
    "BASIC", "BOTTLENECK", "teacher_model", "student_model",
]

BASIC = "basic"
BOTTLENECK = "bottleneck"

_KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _bn_factory(fold_bn: bool, axis_name, fused: bool):
    """ABN constructor, or — in folded mode — the bare activation.

    Folded mode serves the FROZEN teacher: eval-mode BN is an affine map that
    `fold_bn_variables` pre-multiplies into the conv kernels/biases, so the
    module reduces to its activation. Numerically identical modulo float
    reassociation; saves one elementwise pass per conv at inference.
    """
    if not fold_bn:
        return lambda activation, name: ABN(activation=activation,
                                            axis_name=axis_name, fused=fused,
                                            name=name)

    def folded(activation, name):
        del name
        if activation == "none":
            return lambda x, use_running_average=None: x
        assert activation == "leaky_relu"
        return lambda x, use_running_average=None: nn.leaky_relu(x, 0.01)

    return folded


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
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        d = self.dilation * self.multi_grid
        mk_bn = _bn_factory(self.fold_bn, self.axis_name, self.bn_fused)
        bn = lambda name: mk_bn("none", name)
        bias = self.fold_bn
        out = _conv(self.planes, 3, self.stride, d, use_bias=bias,
                    dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out, not train))
        out = _conv(self.planes, 3, 1, d, use_bias=bias, dtype=self.dtype,
                    name="conv2")(out)
        out = bn("bn2")(out, not train)
        if self.has_downsample:
            residual = _conv(self.planes, 1, self.stride, use_bias=bias,
                             dtype=self.dtype, name="downsample_conv")(x)
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
    fold_bn: bool = False

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        d = self.dilation * self.multi_grid
        mk_bn = _bn_factory(self.fold_bn, self.axis_name, self.bn_fused)
        bn = lambda name: mk_bn("none", name)
        bias = self.fold_bn
        out = _conv(self.planes, 1, use_bias=bias, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out, not train))
        out = _conv(self.planes, 3, self.stride, d, use_bias=bias,
                    dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out, not train))
        out = _conv(self.planes * 4, 1, use_bias=bias, dtype=self.dtype,
                    name="conv3")(out)
        out = bn("bn3")(out, not train)
        if self.has_downsample:
            residual = _conv(self.planes * 4, 1, self.stride, use_bias=bias,
                             dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual, not train)
        else:
            residual = x
        return nn.relu(out + residual)


def _shift_rows(a: jnp.ndarray, d: int) -> jnp.ndarray:
    """Row-shifted operator: out[o] = a[o+d] with zero rows out of range
    (the SAME-padding taps of a 3×3 conv acting on an interpolated field)."""
    if d == 0:
        return a
    z = jnp.zeros((abs(d), a.shape[1]), a.dtype)
    return jnp.concatenate([a[d:], z]) if d > 0 else jnp.concatenate([z, a[:d]])


class _StemConv1(nn.Module):
    """The 3-channel stem conv (3→64, 3×3, stride 2) as im2col patches + one
    MXU matmul. XLA's direct lowering of the 3-input-channel conv (and its
    weight gradient) runs far above its HBM floor — expressing it as
    `conv_general_dilated_patches` + dot keeps both the forward and the
    autodiff wgrad on the MXU. Parameter tree ("kernel" (3,3,3,F), optional
    "bias") is identical to `nn.Conv`, so checkpoint import is unaffected.
    Reference counterpart: resnet stem conv1 (pspnet_combine.py:121-127).

    MEASURED SLOWER end-to-end (full-recipe bench 149.6 → 142.6 img/s): XLA
    materializes the (N,Ho,Wo,27) patch tensor instead of fusing the
    extraction into the dot. Kept flag-gated (off) as a recorded negative —
    do not enable without re-measuring."""

    features: int = 64
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", _KERNEL_INIT, (3, 3, x.shape[-1],
                                                     self.features), jnp.float32)
        dt = self.dtype or x.dtype
        p = jax.lax.conv_general_dilated_patches(
            x.astype(dt), (3, 3), window_strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (N,Ho,Wo,C·kh·kw)
        # patches order the feature axis channel-major (C, kh, kw)
        wv = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(-1, self.features)
        y = jax.lax.dot_general(p, wv.astype(dt), (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        return y.astype(dt)


class _StemS2DConv1(nn.Module):
    """The 3-channel stem conv (3→64, 3×3, stride 2) as a space-to-depth
    folded 2×2 stride-1 conv: the input (N,H,W,3) is re-laid to
    (N,H/2,W/2,12) — the stride-2 absorbed into the layout — and the
    canonical 3×3 kernel is folded in-forward into a (2,2,12,F) kernel
    (zero taps where the fold falls outside the 3×3 support; the fold is a
    27-element reshuffle, negligible per step). Output position (i,j) reads
    s2d rows i-1..i / phase p = original rows 2i+(2·bi+p−2), matching
    torch's stride-2 pad-1 window 2i−1..2i+1 exactly (di = 2·bi+p−1).

    Why it wins: both layouts pad the implicit-matmul K dim (27 vs 48) to
    the same 128 lanes, so MXU work is identical — the win is stride-1
    codegen + better lane occupancy on the 12-channel input vs the
    3-channel strided window. The relayout itself costs one extra HBM round
    trip of the stem input (~0.03 ms at 512²×8). MEASURED +0.6% full-recipe
    throughput on v5e (153.3-153.45 vs 152.53 img/s/chip, ROADMAP round-4;
    the two prior stem attempts were recorded negatives) — shipped as the
    DEFAULT via TrainConfig.stem_s2d.

    Parameter tree ("kernel" (3,3,3,F), optional "bias") is identical to
    `nn.Conv`, so checkpoint import is unaffected. Requires even H,W
    (callers gate; odd geometries fall back to the plain conv).
    Reference counterpart: resnet stem conv1 (pspnet_combine.py:121-127).
    """

    features: int = 64
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        kernel = self.param("kernel", _KERNEL_INIT,
                            (3, 3, c, self.features), jnp.float32)
        dt = self.dtype or x.dtype
        # space-to-depth(2): channel index = (pi, pj, c), phase-major
        xs = x.astype(dt).reshape(n, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        # folded[bi,bj,(pi·2+pj)·c+cc,f] = kernel[2bi+pi−1, 2bj+pj−1, cc, f]
        # (zero where the tap index −1 falls off the 3×3 support). Expressed
        # as pad(1 before)→reshape→transpose so XLA fuses it to one tiny op:
        # the earlier .at[].set() loop lowered to 8 serial
        # dynamic-update-slices costing ~0.55 ms/step (xplane, round-4).
        k4 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        folded = k4.reshape(2, 2, 2, 2, c, self.features)       # (bi,pi,bj,pj,c,F)
        folded = folded.transpose(0, 2, 1, 3, 4, 5).reshape(
            2, 2, 4 * c, self.features)
        y = jax.lax.conv_general_dilated(
            xs, folded.astype(dt), window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        return y.astype(dt)


class _PSPBottleneckConv(nn.Module):
    """The PSP 3×3 bottleneck conv over [stage0‖…‖stage3‖x4] WITHOUT
    materializing the concatenated (…,4096) tensor.

    Profiling (teacher fwd, v5e): this conv is the single largest op of the
    step (6.6 of 29.5 ms at batch 8) and the concat's dynamic-update-slices
    add ~0.7 ms more. But each pyramid branch is an align-corners upsample of
    a tiny k×k map (k ≤ 6), i.e. up(p) = Ah·p·Awᵀ — so its share of the conv
    factors exactly as conv3x3(up(p)) = Σ_{taps t} Ah_t·(p·W_t)·Aw_tᵀ with the
    512×512 channel mix done at k×k resolution. Only x4's channel block needs
    a dense conv. Halves the teacher's bottleneck-conv FLOPs and removes the
    concat; bit-identical math up to float reassociation (branch accumulation
    runs in f32 — tighter than the bf16 dense path it replaces).

    The parameter layout (kernel (3,3,ΣC,F), torch key
    pspmodule.bottleneck.0.weight) is unchanged — checkpoint import/export
    and the torch-oracle parity tests cover this path.
    """

    features: int
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, stages, x4: jnp.ndarray, out_hw) -> jnp.ndarray:
        h, w = out_hw
        cs = [int(p.shape[-1]) for p in stages]
        cin = sum(cs) + int(x4.shape[-1])
        kernel = self.param("kernel", _KERNEL_INIT, (3, 3, cin, self.features),
                            jnp.float32)
        dt = self.dtype or x4.dtype
        off = sum(cs)
        dense = jax.lax.conv_general_dilated(
            x4.astype(dt), kernel[:, :, off:, :].astype(dt),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        acc = dense.astype(jnp.float32)
        c0 = 0
        for p in stages:
            kh, kw = int(p.shape[1]), int(p.shape[2])
            ah = interp_matrix_align_corners(kh, h)
            aw = interp_matrix_align_corners(kw, w)
            ah_t = jnp.stack([_shift_rows(ah, d) for d in (-1, 0, 1)])  # (3,H,kh)
            aw_t = jnp.stack([_shift_rows(aw, d) for d in (-1, 0, 1)])  # (3,W,kw)
            kt = kernel[:, :, c0:c0 + p.shape[-1], :].astype(jnp.float32)
            pf = p.astype(jnp.float32)
            q = jnp.einsum("bhwc,uvcd->buvhwd", pf, kt)      # k×k channel mix
            t1 = jnp.einsum("uHh,buvhwd->bvHwd", ah_t, q)
            acc = acc + jnp.einsum("vWw,bvHwd->bHWd", aw_t, t1)
            c0 += p.shape[-1]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            acc = acc + bias
        return acc.astype(dt)


class PSPModule(nn.Module):
    """Pyramid scene parsing pooling head (reference pspnet_combine.py:86-112).

    Each pyramid level is adaptive-avg-pool → 1×1 conv → ABN(leaky_relu) →
    align-corners bilinear upsample back; levels are concatenated with the
    input and bottlenecked by a 3×3 conv + ABN + Dropout2d(0.1). The
    upsample+concat+conv runs as `_PSPBottleneckConv` (same math, half the
    FLOPs, no concat) unless dense_bottleneck is set.
    """

    out_features: int = 512
    sizes: Sequence[int] = (1, 2, 3, 6)
    axis_name: Optional[str] = None
    dtype: Any = None
    bn_fused: bool = False
    fold_bn: bool = False
    dense_bottleneck: bool = False  # materialize concat + plain conv instead
    drop_rate: float = 0.1  # Dropout2d rate (reference pspnet_combine.py:100)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        h, w = x.shape[1], x.shape[2]
        mk_bn = _bn_factory(self.fold_bn, self.axis_name, self.bn_fused)
        bias = self.fold_bn
        priors = []
        for i, size in enumerate(self.sizes):
            p = adaptive_avg_pool_2d(x, (size, size))
            p = _conv(self.out_features, 1, use_bias=bias, dtype=self.dtype,
                      name=f"stage{i}_conv")(p)
            p = mk_bn("leaky_relu", f"stage{i}_bn")(p, not train)
            priors.append(p)
        if self.dense_bottleneck:
            up = [resize_bilinear_align_corners(p, (h, w)) for p in priors]
            y = jnp.concatenate(up + [x], axis=-1)
            y = _conv(self.out_features, 3, use_bias=bias, dtype=self.dtype,
                      name="bottleneck_conv")(y)
        else:
            y = _PSPBottleneckConv(self.out_features, use_bias=bias,
                                   dtype=self.dtype,
                                   name="bottleneck_conv")(priors, x, (h, w))
        y = mk_bn("leaky_relu", "bottleneck_bn")(y, not train)
        y = nn.Dropout(rate=self.drop_rate, broadcast_dims=(1, 2),
                       deterministic=not train or self.drop_rate == 0.0,
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
    fold_bn: bool = False  # eval-only: BN pre-folded into conv weights/biases
    dense_psp_bottleneck: bool = False  # concat+conv PSP path (parity escape)
    stem_patches_conv1: bool = False  # im2col stem conv1 (measured slower)
    # space-to-depth folded stem conv1: measured +0.6% full-recipe throughput
    # on v5e (ROADMAP round-4); TrainConfig.stem_s2d defaults it ON
    stem_s2d: bool = False
    drop_rate: float = 0.1  # PSP/DSN Dropout2d rate; 0.0 disables (oracles)
    # Uniform channel-width multiplier over the stem / residual plan / DSN /
    # PSP widths (heads stay at num_classes). 1.0 is the reference geometry
    # (checkpoint-compatible); fractions give width-scaled family members —
    # used by dryrun_multichip to exercise the FULL sharded train program at
    # a fraction of the simulated-device FLOPs. Scaled widths stay even for
    # mult ≥ 1/32, so the tp (model-axis) channel sharding still divides.
    width_mult: float = 1.0
    # Rematerialize each residual block on the backward pass (jax.checkpoint
    # per block): activation memory drops from O(depth) intermediates to one
    # saved tensor per block, at the cost of one extra forward inside the
    # backward — the TPU lever for larger batches/crops on a fixed HBM
    # budget. Values/grads are identical (the recompute replays the same
    # XLA ops). The reference's counterpart memory trick is the in-place
    # ABN (libs/functions.py:214-221), which XLA buffer reuse already
    # subsumes; remat is the lever beyond it.
    remat: bool = False

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
        mk_bn = _bn_factory(self.fold_bn, self.axis_name, self.bn_fused)
        bn = lambda name: mk_bn("none", name)
        bias = self.fold_bn
        wm = lambda c: max(1, int(round(c * self.width_mult)))
        # Stem: 3 -> 64 -> 64 -> 128, stride 2 then ceil-mode 3x3/2 max pool.
        if self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            conv1_out = _StemS2DConv1(wm(64), use_bias=bias, dtype=self.dtype,
                                      name="conv1")(x)
        elif self.stem_patches_conv1:
            conv1_out = _StemConv1(wm(64), use_bias=bias, dtype=self.dtype,
                                   name="conv1")(x)
        else:
            conv1_out = _conv(wm(64), 3, 2, use_bias=bias, dtype=self.dtype,
                              name="conv1")(x)
        x = nn.relu(bn("bn1")(conv1_out, not train))
        x = nn.relu(bn("bn2")(_conv(wm(64), 3, 1, use_bias=bias, dtype=self.dtype,
                                    name="conv2")(x), not train))
        x = nn.relu(bn("bn3")(_conv(wm(128), 3, 1, use_bias=bias, dtype=self.dtype,
                                    name="conv3")(x), not train))
        x = max_pool_2d(x, (3, 3), (2, 2), (1, 1), ceil_mode=True)

        inplanes = wm(128)
        feats = []
        # static_argnums=(2,): (self, x, train) — `train` selects BN mode via
        # Python control flow, so it must stay concrete under jax.checkpoint.
        block_cls = (nn.remat(self._block_cls, static_argnums=(2,))
                     if self.remat else self._block_cls)
        plan = [
            # (planes, stride, dilation)
            (wm(64), 1, 1),
            (wm(128), 2, 1),
            (wm(256), 1, 2),
            (wm(512), 1, 4),
        ]
        for li, ((planes, stride, dilation), blocks) in enumerate(zip(plan, self.layers), start=1):
            for bi in range(blocks):
                has_down = bi == 0 and (stride != 1 or inplanes != planes * self._expansion)
                x = block_cls(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation,
                    has_downsample=has_down,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    bn_fused=self.bn_fused,
                    fold_bn=self.fold_bn,
                    name=f"layer{li}_{bi}",
                )(x, train)
                inplanes = planes * self._expansion
            feats.append(x)

        x1, x2, x3, x4 = feats

        # DSN auxiliary head from layer3.
        dsn_mid = wm(512) if self.block == BOTTLENECK else wm(128)
        d = _conv(dsn_mid, 3, use_bias=True, dtype=self.dtype, name="dsn_conv1")(x3)
        d = mk_bn("leaky_relu", "dsn_bn")(d, not train)
        d = nn.Dropout(rate=self.drop_rate, broadcast_dims=(1, 2),
                       deterministic=not train or self.drop_rate == 0.0,
                       name="dsn_dropout")(d)
        x_dsn = _conv(self.num_classes, 1, use_bias=True, dtype=self.dtype, name="dsn_conv2")(d)

        psp_out = wm(512) if self.block == BOTTLENECK else wm(128)
        x_feat_after_psp = PSPModule(out_features=psp_out, axis_name=self.axis_name,
                                     dtype=self.dtype, bn_fused=self.bn_fused,
                                     fold_bn=self.fold_bn,
                                     dense_bottleneck=self.dense_psp_bottleneck,
                                     drop_rate=self.drop_rate,
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
