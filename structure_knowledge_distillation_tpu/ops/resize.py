"""Align-corners bilinear resize, expressed as matmuls (MXU-friendly).

The reference uses `F.upsample(..., mode='bilinear', align_corners=True)` in
three load-bearing places (reference: utils/criterion.py:182, networks/
pspnet_combine.py:110, networks/evaluate.py:170). `jax.image.resize` has no
align-corners mode, and a gather-based implementation maps poorly onto the TPU
vector unit. Instead we build the (static-shape) 1-D interpolation operators
A_h: (H_out, H_in) and A_w: (W_out, W_in) at trace time as dense constants and
apply  y = A_h · x · A_wᵀ  per image/channel — two dense matmuls that run on
the MXU and fuse with surrounding ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_bilinear_align_corners", "interp_matrix_align_corners"]


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """Dense (n_out, n_in) align-corners linear-interpolation operator."""
    a = np.zeros((n_out, n_in), dtype=np.float64)
    if n_out == 1:
        # torch semantics: single output sample reads source coordinate 0.
        a[0, 0] = 1.0
        return a.astype(np.float32)
    if n_in == 1:
        a[:, 0] = 1.0
        return a.astype(np.float32)
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    frac = src - lo
    rows = np.arange(n_out)
    np.add.at(a, (rows, lo), 1.0 - frac)
    np.add.at(a, (rows, hi), frac)
    return a.astype(np.float32)


def interp_matrix_align_corners(n_in: int, n_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """The 1-D align-corners interpolation matrix as a JAX constant."""
    return jnp.asarray(_interp_matrix_np(n_in, n_out), dtype=dtype)


def resize_bilinear_align_corners(
    x: jnp.ndarray, size: tuple[int, int], exact: bool = True
) -> jnp.ndarray:
    """Bilinear align-corners resize of an NHWC tensor to `size` = (H, W).

    Numerically matches torch's ``F.interpolate(mode='bilinear',
    align_corners=True)`` on NCHW up to layout. Both spatial contractions are
    dense matmuls.

    exact=True (default): weights applied in f32 at HIGHEST precision (for
    eval / parity paths). exact=False: computed in the input dtype at default
    precision — for bf16 training-loss paths this halves the HBM traffic of
    the big upsampled tensors at ~1e-3 relative loss error (measured: the
    512² CE chain drops from 21.7 GB to ~12 GB per step).
    """
    if x.ndim != 4:
        raise ValueError(f"expected NHWC input, got shape {x.shape}")
    h_out, w_out = size
    n, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    orig_dtype = x.dtype
    if exact or x.dtype == jnp.float32:
        xf = x.astype(jnp.float32)
        a_h = interp_matrix_align_corners(h_in, h_out)
        a_w = interp_matrix_align_corners(w_in, w_out)
        hi = jax.lax.Precision.HIGHEST
        y = jnp.einsum("oh,nhwc->nowc", a_h, xf, precision=hi)
        y = jnp.einsum("pw,nhwc->nhpc", a_w, y, precision=hi)
        return y.astype(orig_dtype)
    a_h = interp_matrix_align_corners(h_in, h_out, dtype=x.dtype)
    a_w = interp_matrix_align_corners(w_in, w_out, dtype=x.dtype)
    # (N,H,W,C) --A_h--> (N,H_out,W,C) --A_w--> (N,H_out,W_out,C)
    y = jnp.einsum("oh,nhwc->nowc", a_h, x)
    y = jnp.einsum("pw,nhwc->nhpc", a_w, y)
    return y
