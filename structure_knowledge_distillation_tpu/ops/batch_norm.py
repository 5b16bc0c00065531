"""Activated (sync) batch normalization — the TPU-native InPlaceABN(Sync).

The reference backs every conv block with `InPlaceABN(Sync)` (reference:
libs/bn.py:48-193), a CUDA extension (reference: libs/src/bn.cu) plus a
Python-queue cross-GPU protocol (reference: libs/functions.py:177-209) that
exists to (a) fuse BN + activation, (b) normalize in place to save memory, and
(c) synchronize statistics across data-parallel replicas.

On TPU all three collapse:
  (a) XLA fuses the normalize+activate elementwise chain into neighbouring
      ops (and an optional Pallas kernel is provided in `pallas_bn.py`),
  (b) rematerialization + buffer donation replace in-place memory tricks,
  (c) statistics over the *global* batch are automatic when the step is jitted
      over a `Mesh` with the batch sharded on the `data` axis — XLA turns the
      full-batch mean into an ICI all-reduce. An explicit `axis_name` is also
      supported for `shard_map`/`pmap` style code.

Semantics kept bit-compatible with the reference where it matters for
checkpoint import / numeric parity:
  * gamma = |weight| + eps (reference: libs/src/bn.cu:153),
  * biased variance for normalization, Bessel-corrected running-var update
    (reference: libs/functions.py:91,209),
  * activation in {none, leaky_relu(0.01), elu} (reference: libs/bn.py:65).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ABN", "BatchNorm2d", "abn_normalize", "abn_train"]


def _apply_activation(x: jnp.ndarray, activation: str, slope: float) -> jnp.ndarray:
    if activation == "none":
        return x
    if activation == "leaky_relu":
        return jnp.where(x >= 0, x, x * slope)
    if activation == "elu":
        return jnp.where(x >= 0, x, jnp.expm1(x))
    raise ValueError(f"unknown activation {activation!r}")


def abn_normalize(
    x: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    weight: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    *,
    eps: float,
    activation: str = "none",
    slope: float = 0.01,
    abs_gamma: bool = True,
) -> jnp.ndarray:
    """The (pure-XLA) normalize + affine + activation core, NHWC, f32 math."""
    inv_std = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    if weight is not None:
        gamma = jnp.abs(weight) + eps if abs_gamma else weight
        scale = gamma.astype(jnp.float32) * inv_std
    else:
        scale = inv_std
    shift = bias.astype(jnp.float32) if bias is not None else 0.0
    y = (x.astype(jnp.float32) - mean.astype(jnp.float32)) * scale + shift
    y = _apply_activation(y, activation, slope)
    return y.astype(x.dtype)


def _channel_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel sum over the leading (N,H,W) axes with f32 accumulation.

    Deliberately a plain axis-reduce on the NHWC tensor: a reshape-to-2D +
    ones-matmul formulation forces a relayout copy when H is not a multiple
    of the 8-row sublane tile (65² feature maps), measured 2.4× slower per
    ABN layer than this form."""
    reduce_axes = tuple(range(x.ndim - 1))
    return jnp.sum(x, axis=reduce_axes, dtype=jnp.float32)


def _moments(x: jnp.ndarray, axis_name: Optional[str]):
    s1 = _channel_sum(x)
    s2 = _channel_sum(jnp.square(x.astype(jnp.float32)))
    n = x.size // x.shape[-1]
    if axis_name is not None:
        s1 = jax.lax.psum(s1, axis_name=axis_name)
        s2 = jax.lax.psum(s2, axis_name=axis_name)
        n = n * jax.lax.psum(1, axis_name=axis_name)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    return mean, var, n


def _gamma(weight: jnp.ndarray, eps: float, abs_gamma: bool) -> jnp.ndarray:
    w = weight.astype(jnp.float32)
    return jnp.abs(w) + eps if abs_gamma else w


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def abn_train(x, weight, bias, eps: float, activation: str, slope: float,
              abs_gamma: bool, axis_name: Optional[str]):
    """Training-mode activated BN over batch statistics, with the reference's
    ANALYTIC backward as a custom VJP.

    Why: autodiff of the inline formulation explodes into ~5 separate reduce
    fusions per BN which XLA schedules poorly (profiled at ~14 ms of a 50 ms
    step). This op pins the exact CUDA-kernel gradient of the reference
    (libs/src/bn.cu:167-232 / libs/functions.py:253-294): two forward
    moment reductions and two backward reductions (edz = Σdh,
    eydz = Σ dh·ŷ), each as a single MXU ones-contraction, with

        dx = γ·invstd·(dh − edz/n − ŷ·eydz/n),
        dweight = sign(w)·eydz  (γ = |w|+eps),  dbias = edz,

    and edz/eydz psum'd over `axis_name` exactly like the reference's
    cross-replica backward (functions.py:263-280). Under pjit the
    contractions partition over the sharded batch automatically.

    Returns (z, mean, var); mean/var feed the module's running-stat update
    and are treated as non-differentiable (their cotangents are ignored).
    """
    z, _, mean, var = _abn_train_fwd_impl(x, weight, bias, eps, activation,
                                          slope, abs_gamma, axis_name)
    return z, mean, var


def _abn_train_fwd_impl(x, weight, bias, eps, activation, slope, abs_gamma,
                        axis_name):
    mean, var, n = _moments(x, axis_name)
    inv_std = jax.lax.rsqrt(var + eps)
    scale = _gamma(weight, eps, abs_gamma) * inv_std
    shift = bias.astype(jnp.float32) - mean * scale
    h = x.astype(jnp.float32) * scale + shift
    z = _apply_activation(h, activation, slope).astype(x.dtype)
    return z, n, mean, var


def _abn_train_fwd(x, weight, bias, eps, activation, slope, abs_gamma,
                   axis_name):
    z, n, mean, var = _abn_train_fwd_impl(x, weight, bias, eps, activation,
                                          slope, abs_gamma, axis_name)
    return (z, mean, var), (x, weight, bias, mean, var, n)


def _abn_train_bwd(eps, activation, slope, abs_gamma, axis_name, residuals, g):
    dz = g[0]  # cotangents for mean/var (g[1], g[2]) are running-stat reads
    x, weight, bias, mean, var, n = residuals
    inv_std = jax.lax.rsqrt(var + eps)
    gamma = _gamma(weight, eps, abs_gamma)

    xf = x.astype(jnp.float32)
    y = (xf - mean) * inv_std  # ŷ, recomputed (cheap elementwise; fuses)
    dzf = dz.astype(jnp.float32)
    if activation == "none":
        dh = dzf
    else:
        h = y * gamma + bias.astype(jnp.float32)  # pre-activation
        if activation == "leaky_relu":
            dh = jnp.where(h >= 0, dzf, dzf * slope)
        elif activation == "elu":
            dh = jnp.where(h >= 0, dzf, dzf * jnp.exp(h))
        else:
            raise ValueError(f"unknown activation {activation!r}")

    edz = _channel_sum(dh)
    eydz = _channel_sum(dh * y)
    if axis_name is not None:
        edz = jax.lax.psum(edz, axis_name=axis_name)
        eydz = jax.lax.psum(eydz, axis_name=axis_name)

    dx = (gamma * inv_std) * (dh - edz / n - y * (eydz / n))
    dweight = (jnp.sign(weight) if abs_gamma else jnp.ones_like(weight)) * eydz
    dbias = edz
    return (dx.astype(x.dtype), dweight.astype(weight.dtype),
            dbias.astype(weight.dtype))


abn_train.defvjp(_abn_train_fwd, _abn_train_bwd)


class ABN(nn.Module):
    """Activated batch norm over the channel (last) axis of an NHWC tensor.

    Attributes:
      momentum: torch-convention update, running = (1-m)*running + m*batch.
      activation: 'none' | 'leaky_relu' | 'elu' (fused after normalization).
      abs_gamma: use gamma = |weight| + eps (the reference ABN convention).
      axis_name: optional mesh axis to pmean batch statistics over. Leave
        None under pjit/global-sharding (sync is implicit).
      use_running_average: eval mode (frozen statistics) when True.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    activation: str = "none"
    slope: float = 0.01
    abs_gamma: bool = True
    affine: bool = True
    axis_name: Optional[str] = None
    use_running_average: Optional[bool] = None
    param_dtype: Any = jnp.float32
    fused: bool = False  # use the Pallas kernels in pallas_bn.py

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: Optional[bool] = None) -> jnp.ndarray:
        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        features = x.shape[-1]
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (features,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (features,), self.param_dtype)
        else:
            weight = bias = None

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if self.fused and self.affine:
            from structure_knowledge_distillation_tpu.ops import pallas_bn

            if use_running_average:
                return pallas_bn.abn_fused_eval(
                    x, weight, bias, ra_mean.value, ra_var.value, self.eps,
                    self.activation, self.slope, self.abs_gamma,
                )
            z, mean, var = pallas_bn.abn_fused_train(
                x, weight, bias, self.eps, self.activation, self.slope,
                self.abs_gamma, self.axis_name,
            )
            if not self.is_initializing():
                n = x.size // features
                if self.axis_name is not None:
                    n *= jax.lax.psum(1, axis_name=self.axis_name)
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * (var * bessel)
            return z

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif self.affine:
            # custom-VJP training core: analytic bn.cu backward, MXU moment
            # reductions (see abn_train docstring)
            z, mean, var = abn_train(x, weight, bias, self.eps,
                                     self.activation, self.slope,
                                     self.abs_gamma, self.axis_name)
            if not self.is_initializing():
                n = x.size // features
                if self.axis_name is not None:
                    n *= jax.lax.psum(1, axis_name=self.axis_name)
                bessel = n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * (var * bessel)
            return z
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, axis_name=self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, axis_name=self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)

            if not self.is_initializing():
                n = x.size // features
                if self.axis_name is not None:
                    n *= jax.lax.psum(1, axis_name=self.axis_name)
                bessel = n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * (var * bessel)

        return abn_normalize(
            x,
            mean,
            var,
            weight,
            bias,
            eps=self.eps,
            activation=self.activation,
            slope=self.slope,
            abs_gamma=self.abs_gamma,
        )


class BatchNorm2d(ABN):
    """Plain torch-style BatchNorm2d (no |gamma| quirk, no activation).

    Used by the discriminator's preprocess layer (reference:
    networks/sagan_models.py:148), which is a stock `nn.BatchNorm2d`.
    """

    activation: str = "none"
    abs_gamma: bool = False
