"""Pallas kernel: argmax over align-corners-upsampled logits, computed
blockwise from the low-resolution logits.

The reference's whole-image eval upsamples stride-8 logits to the output
resolution and takes the per-pixel argmax (reference networks/evaluate.py:
106-113 + the argmax at :183-187). At Cityscapes full-res that
materializes a (1024, 2048, 19) f32 tensor (~159 MB) just to reduce it to
a (1024, 2048) class map. This kernel interpolates each row-block of all
classes in VMEM (same two-matmul align-corners structure as the CE kernel
in pallas_ce.py) and emits only the int32 argmax block — HBM traffic is
the low-res logits in and the class map out.

Tie-breaking matches `jnp.argmax`/torch argmax: the FIRST class index
attaining the maximum wins. No backward (eval only).

Measured (v5e, R18 student fwd + argmax + confusion, fenced): full-res
1024×2048 eval 31.4 → 30.5 ms/img (the forward dominates; the XLA
resize+argmax it replaces is ~3 ms), 512² 5.07 → 5.24 (slightly WORSE —
kernel launch overhead exceeds the win at small outputs). The eval path
therefore uses this kernel only for outputs of ≥1M pixels
(`argmax_kernel_fits`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from structure_knowledge_distillation_tpu.ops.pallas_ce import _fill_up_scratch
from structure_knowledge_distillation_tpu.ops.resize import (
    interp_matrix_align_corners,
)

__all__ = ["upsampled_argmax", "argmax_kernel_fits"]

_VMEM_BUDGET = 14 * 1024 * 1024


def _block_candidates(h_out: int):
    return [b for b in (64, 32, 16, 8) if h_out % b == 0]


def _vmem_bytes(logits_shape, out_size, bp) -> int:
    n, h_in, w_in, c = logits_shape
    h_out, w_out = out_size
    x_block = c * h_in * w_in * 4
    aw = w_out * w_in * 4
    ah = bp * h_in * 4
    pred = bp * w_out * 4
    scratch = c * bp * (w_out + w_in) * 4
    return 2 * (x_block + aw + ah + pred) + scratch


def _pick_block(logits_shape, out_size):
    for bp in _block_candidates(out_size[0]):
        if _vmem_bytes(logits_shape, out_size, bp) <= _VMEM_BUDGET:
            return bp
    return None


def argmax_kernel_fits(logits_shape, out_size) -> bool:
    """True when the fused kernel supports this shape within the VMEM
    budget AND the output is large enough for the kernel to pay off
    (≥1M pixels — see module docstring measurements). Callers fall back
    to the XLA resize+argmax otherwise."""
    if out_size[0] * out_size[1] < 1_000_000:
        return False
    return _pick_block(logits_shape, out_size) is not None


def _argmax_kernel(ah_ref, aw_ref, x_ref, pred_ref, up_ref, tmp_ref, *, c: int):
    ah_blk = ah_ref[:]
    aw = aw_ref[:]
    _fill_up_scratch(ah_blk, aw, x_ref, up_ref, tmp_ref, c)
    up = up_ref[:]                                   # (C, BP, W) f32
    m = jnp.max(up, axis=0)
    cls = jax.lax.broadcasted_iota(jnp.int32, up.shape, 0)
    first = jnp.min(jnp.where(up >= m[None], cls, c), axis=0)
    pred_ref[0] = first


def upsampled_argmax(logits: jnp.ndarray, out_size: Tuple[int, int],
                     *, interpret: bool | None = None) -> jnp.ndarray:
    """argmax_C(resize_align_corners(logits, out_size)) as (N, H, W) int32.

    logits: (N, h, w, C), any float dtype (interpolation runs in f32 —
    identical to the XLA eval path which casts to f32 before resizing).
    """
    n, h_in, w_in, c = logits.shape
    h_out, w_out = out_size
    bp = _pick_block(logits.shape, out_size)
    if bp is None:
        raise ValueError(
            f"no VMEM-feasible row block for {logits.shape} -> {out_size}; "
            "gate with argmax_kernel_fits()")
    ah = interp_matrix_align_corners(h_in, h_out)
    aw = interp_matrix_align_corners(w_in, w_out)
    x_cm = jnp.transpose(logits, (0, 3, 1, 2))       # (N, C, Hin, Win)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_argmax_kernel, c=c)
    return pl.pallas_call(
        kernel,
        grid=(n, h_out // bp),
        in_specs=[
            pl.BlockSpec((bp, h_in), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_out, w_in), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h_in, w_in), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bp, w_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((c, bp, w_out), jnp.float32),
            pltpu.VMEM((c, bp, w_in), jnp.float32),
        ],
        interpret=interpret,
    )(ah, aw, x_cm)
