"""Spectral normalization for conv weights, with power-iteration state.

Semantics follow the reference wrapper (reference: networks/spectral.py:23-35):
one power iteration per forward, u/v vectors persisted across steps, the
effective weight is w / sigma with sigma = u·(W v). The u/v updates carry no
gradient (the reference mutates `.data`); gradients flow through w only.

In JAX the u/v state lives in a `spectral` variable collection which the
train step threads through explicitly — no hidden mutation, and the whole
update compiles into the jitted step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["SNConv"]


def _l2normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v) + eps)


class SNConv(nn.Module):
    """2-D convolution whose weight is spectrally normalized.

    The weight matrix for power iteration is the torch-layout flattening
    (out_channels, in_channels * kh * kw), so imported torch u/v/σ line up.
    """

    features: int
    kernel_size: tuple[int, int] = (4, 4)
    strides: tuple[int, int] = (2, 2)
    padding: tuple[int, int] = (1, 1)
    use_bias: bool = True
    power_iterations: int = 1
    update_stats: Optional[bool] = None  # run power iteration + store u/v
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: Optional[bool] = None) -> jnp.ndarray:
        update_stats = nn.merge_param("update_stats", self.update_stats, update_stats)
        kh, kw = self.kernel_size
        in_features = x.shape[-1]
        # Stored HWIO (JAX conv layout); flattened in torch OIHW order for PI.
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (kh, kw, in_features, self.features),
            jnp.float32,
        )
        height = self.features
        width = kh * kw * in_features

        u_var = self.variable(
            "spectral", "u",
            lambda: _l2normalize(jax.random.normal(self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0), (height,))),
        )
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2normalize(jax.random.normal(self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(1), (width,))),
        )

        # torch flattening: (O, I, kh, kw) -> (O, I*kh*kw)
        w_mat = jnp.transpose(w, (3, 2, 0, 1)).reshape(height, width)
        u, v = u_var.value, v_var.value
        for _ in range(self.power_iterations):
            v = _l2normalize(w_mat.T @ u)
            u = _l2normalize(w_mat @ v)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        if update_stats and not self.is_initializing():
            u_var.value = u
            v_var.value = v
        sigma = u @ (w_mat @ v)
        w_sn = (w / sigma).astype(self.dtype or x.dtype)

        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            w_sn,
            window_strides=self.strides,
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y
