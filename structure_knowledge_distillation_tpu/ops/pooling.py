"""Pooling ops with torch-compatible semantics, built on XLA reduce_window.

Two pooling quirks of the reference are load-bearing for shape/number parity:

  * ceil-mode max pooling — the ResNet stem pool (reference:
    networks/pspnet_combine.py:130) turns 512² training crops into 65×65
    feature maps (not 64×64), which sets the discriminator geometry
    (`imsize_for_adv=65`, reference: utils/train_options.py:53), and the
    pairwise-distillation pool (reference: utils/criterion.py:243) is also
    ceil-mode.
  * torch-style adaptive average pooling with floor/ceil bin edges (reference:
    networks/pspnet_combine.py:103) — bins overlap when the input size does
    not divide the output size (65 → 6 bins). We express it as two small
    dense averaging matmuls (MXU) instead of a gather loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["max_pool_2d", "adaptive_avg_pool_2d", "avg_pool_matrix"]


def _pool_out_size(length: int, kernel: int, stride: int, pad: int, ceil_mode: bool) -> int:
    """Output length of a 1-D pooling, torch rules."""
    if ceil_mode:
        out = -(-(length + 2 * pad - kernel) // stride) + 1
        # torch: the last window must start inside the input or left padding.
        if (out - 1) * stride >= length + pad:
            out -= 1
    else:
        out = (length + 2 * pad - kernel) // stride + 1
    return out


def max_pool_2d(
    x: jnp.ndarray,
    kernel: tuple[int, int],
    stride: tuple[int, int] | None = None,
    padding: tuple[int, int] = (0, 0),
    ceil_mode: bool = False,
) -> jnp.ndarray:
    """Max pooling over the H, W axes of an NHWC tensor, torch semantics.

    Padding is with -inf (so padded positions never win), and ceil_mode adds
    the extra high-side padding needed to realize the torch output size.

    Non-overlapping pools (stride == kernel, e.g. the pairwise-distillation
    pool, reference utils/criterion.py:241-243) take a tiled pad→reshape→max
    path with a custom first-match VJP instead of reduce_window: XLA's
    select_and_scatter backward allocates scoped vmem proportional to the
    window and fails to compile past ~32² windows (observed at 1024² crops,
    window 64²), while the tiled backward is plain elementwise work at any
    window size. Gradient ties route to the first element in row-major window
    order — exactly torch's max_pool2d backward.
    """
    if stride is None:
        stride = kernel
    n, h, w, c = x.shape
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    out_h = _pool_out_size(h, kh, sh, ph, ceil_mode)
    out_w = _pool_out_size(w, kw, sw, pw, ceil_mode)
    if (sh, sw) == (kh, kw):
        return _max_pool_tiled(x, (kh, kw), (ph, pw), (out_h, out_w), x.shape)
    hi_h = (out_h - 1) * sh + kh - h - ph
    hi_w = (out_w - 1) * sw + kw - w - pw
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, max(hi_h, 0)), (pw, max(hi_w, 0)), (0, 0)),
    )


def _tile_windows(x, kernel, padding, out_hw):
    """Pad/crop to (oh·kh, ow·kw) and expose each window as a flat axis:
    (N, oh, ow, kh·kw, C), window elements in row-major order (torch's
    tie-break order)."""
    n, h, w, c = x.shape
    kh, kw = kernel
    ph, pw = padding
    oh, ow = out_hw
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    # floor mode can drop an input tail; crop it before padding up
    x = x[:, : min(h, oh * kh - ph), : min(w, ow * kw - pw), :]
    pad_h = oh * kh - ph - x.shape[1]
    pad_w = ow * kw - pw - x.shape[2]
    xp = jnp.pad(x, ((0, 0), (ph, pad_h), (pw, pad_w), (0, 0)),
                 constant_values=neg)
    t = xp.reshape(n, oh, kh, ow, kw, c).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(n, oh, ow, kh * kw, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _max_pool_tiled(x, kernel, padding, out_hw, x_shape):
    return jnp.max(_tile_windows(x, kernel, padding, out_hw), axis=3)


def _max_pool_tiled_fwd(x, kernel, padding, out_hw, x_shape):
    t = _tile_windows(x, kernel, padding, out_hw)
    # argmax returns the FIRST maximum — torch's tie-break
    return jnp.max(t, axis=3), jnp.argmax(t, axis=3)


def _max_pool_tiled_bwd(kernel, padding, out_hw, x_shape, idx, dy):
    n, h, w, c = x_shape
    kh, kw = kernel
    ph, pw = padding
    oh, ow = out_hw
    taps = jax.nn.one_hot(idx, kh * kw, axis=3, dtype=dy.dtype)
    dt = taps * dy[:, :, :, None, :]  # (N, oh, ow, kh·kw, C)
    dxp = dt.reshape(n, oh, ow, kh, kw, c).transpose(0, 1, 3, 2, 4, 5)
    dxp = dxp.reshape(n, oh * kh, ow * kw, c)
    dx = dxp[:, ph:ph + h, pw:pw + w, :]
    # floor mode may have cropped an input tail — pad it back with zeros
    if dx.shape[1] < h or dx.shape[2] < w:
        dx = jnp.pad(dx, ((0, 0), (0, h - dx.shape[1]),
                          (0, w - dx.shape[2]), (0, 0)))
    return (dx,)


_max_pool_tiled.defvjp(_max_pool_tiled_fwd, _max_pool_tiled_bwd)


@functools.lru_cache(maxsize=None)
def _avg_pool_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """Dense (n_out, n_in) torch-adaptive-average-pool operator."""
    a = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -(-((i + 1) * n_in) // n_out)  # ceil
        a[i, start:end] = 1.0 / (end - start)
    return a.astype(np.float32)


def avg_pool_matrix(n_in: int, n_out: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_avg_pool_matrix_np(n_in, n_out), dtype=dtype)


@functools.lru_cache(maxsize=None)
def _bin_membership_np(n_in: int, n_out: int):
    """0/1 bin-membership matrix + per-bin 1/count, exactly factoring the
    adaptive-average operator (both pieces are exactly representable in
    bf16/f32, unlike the fused 1/k weights)."""
    a = np.zeros((n_out, n_in), dtype=np.float32)
    inv = np.zeros((n_out,), dtype=np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -(-((i + 1) * n_in) // n_out)
        a[i, start:end] = 1.0
        inv[i] = 1.0 / (end - start)
    return a, inv


def adaptive_avg_pool_2d(x: jnp.ndarray, output_size: tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d on an NHWC tensor, as two dense matmuls.

    bf16 inputs take the MXU-native path: 0/1 membership matmuls with f32
    accumulation then an exact f32 per-bin scale — same result as the f32
    path up to the f32 sum order (profiling showed the previous
    f32/HIGHEST einsums lowering to the slow 6-pass emulation, ~0.8 ms of
    the teacher step)."""
    n, h, w, c = x.shape
    oh, ow = output_size
    orig_dtype = x.dtype
    if orig_dtype == jnp.bfloat16:
        m_h, inv_h = _bin_membership_np(h, oh)
        m_w, inv_w = _bin_membership_np(w, ow)
        y = jnp.einsum("oh,nhwc->nowc", jnp.asarray(m_h, jnp.bfloat16), x,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("pw,nhwc->nhpc", jnp.asarray(m_w, jnp.bfloat16),
                       y.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        scale = jnp.asarray(np.outer(inv_h, inv_w), jnp.float32)
        return (y * scale[None, :, :, None]).astype(orig_dtype)
    xf = x.astype(jnp.float32)
    a_h = avg_pool_matrix(h, oh)
    a_w = avg_pool_matrix(w, ow)
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,nhwc->nowc", a_h, xf, precision=hi)
    y = jnp.einsum("pw,nhwc->nhpc", a_w, y, precision=hi)
    return y.astype(orig_dtype)
