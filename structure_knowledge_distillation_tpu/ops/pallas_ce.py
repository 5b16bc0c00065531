"""Pallas kernel: cross-entropy over align-corners-upsampled logits,
computed blockwise from the low-resolution logits.

The reference semantics (utils/criterion.py:179-188) upsample stride-8 logits
(65² × 19ch) to the label resolution (512²) and take ignore-masked mean CE.
Done literally, the upsampled tensor (8×512²×19) plus its log-softmax and
gather/scatter passes dominate the student step's HBM traffic (~12 GB/step
measured; see ROADMAP.md).

This kernel never materializes it: the whole 65²-per-channel logit map of one
image fits in VMEM, so each grid step interpolates a (BP, W) row-block per
class on the MXU (two small matmuls with the 1-D align-corners operators,
channel-unrolled to keep every operand a clean 2-D tile — Mosaic does not
allow mixed-dimension reshapes), stages the C per-class blocks in a VMEM
scratch, reduces lse/picked/mask on the VPU, and accumulates scalar
(loss-sum, valid-count) in SMEM. The custom-VJP backward recomputes the block
and accumulates dX = Ahᵀ·D·Awᵀ directly into the low-res gradient — HBM
traffic is just the low-res logits + labels.

All arithmetic is f32 (better than the bf16-materialization fallback path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from structure_knowledge_distillation_tpu.ops.resize import interp_matrix_align_corners

__all__ = ["upsampled_ce_loss", "upsampled_ce_loss_dsn"]


def _pick_block(h_out: int) -> int:
    for cand in (64, 32, 16, 8):
        if h_out % cand == 0:
            return cand
    return h_out


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def kernel_vmem_bytes(logits_shape, out_size) -> int:
    """Approximate VMEM footprint of one grid step (inputs + scratch), for
    callers to check against the ~16 MB budget before choosing this kernel."""
    n, h_in, w_in, c = logits_shape
    h_out, w_out = out_size
    bp = _pick_block(h_out)
    x_block = c * h_in * w_in * 4
    aw = w_out * w_in * 4
    ah = bp * h_in * 4
    labels = bp * w_out * 4
    scratch = c * bp * (w_out + w_in) * 4
    return 2 * (x_block + aw + ah + labels) + scratch  # double-buffered inputs


def _dot(a, b, contract=((1,), (0,))):
    return jax.lax.dot_general(a, b, (contract, ((), ())),
                               preferred_element_type=jnp.float32)


def _fill_up_scratch(ah_blk, aw, x_ref, up_ref, tmp_ref, c):
    """up_ref[k] = Ah_blk · X_k · Awᵀ for each class k.

    The cheap height contraction (BP·Hin·Win per class) stays a per-class
    loop, but the dominant width contraction (BP·Win·W per class) is ONE
    MXU matmul over all classes: (C·BP, Win) @ Awᵀ. The (C,BP,Win)↔
    (C·BP,Win) reshapes are layout no-ops when BP is a multiple of the
    8-row sublane tile (guaranteed by `_pick_block` for multiple-of-8
    outputs); otherwise fall back to the per-class width loop."""
    bp, w_in = tmp_ref.shape[1], tmp_ref.shape[2]
    w_out = aw.shape[0]
    # height contraction batched over classes (Mosaic supports one batch
    # dim on dot_general; broadcasting Ah is VMEM-cheap)
    ah_b = jnp.broadcast_to(ah_blk, (c,) + ah_blk.shape)
    tmp_ref[:] = jax.lax.dot_general(
        ah_b, x_ref[0].astype(jnp.float32),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    if bp % 8 == 0:
        up = _dot(tmp_ref[:].reshape(c * bp, w_in), aw, contract=((1,), (1,)))
        up_ref[:] = up.reshape(c, bp, w_out)
    else:
        for k in range(c):
            up_ref[k] = _dot(tmp_ref[k], aw, contract=((1,), (1,)))


def _lse_and_picked(up: jnp.ndarray, labels: jnp.ndarray):
    """(C,BP,W) logits block -> (lse, picked, exp, sum_exp), all (BP,W) except
    exp (C,BP,W). Whole-scratch tensor ops (one VPU op per reduction) instead
    of per-class unrolled loops — the unrolled form was issue-bound."""
    m = jnp.max(up, axis=0)
    e = jnp.exp(up - m[None])
    s = jnp.sum(e, axis=0)
    cls = jax.lax.broadcasted_iota(jnp.int32, up.shape, 0)
    picked = jnp.sum(jnp.where(cls == labels[None], up, 0.0), axis=0)
    return m + jnp.log(s), picked, e, s


def _ce_fwd_kernel(ah_ref, aw_ref, x_ref, labels_ref, loss_ref, cnt_ref, up_ref,
                   tmp_ref, *, c: int, ignore: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        loss_ref[0, 0] = jnp.float32(0.0)
        cnt_ref[0, 0] = jnp.float32(0.0)

    ah_blk = ah_ref[:]
    aw = aw_ref[:]
    labels = labels_ref[0]
    _fill_up_scratch(ah_blk, aw, x_ref, up_ref, tmp_ref, c)

    lse, picked, _, _ = _lse_and_picked(up_ref[:], labels)
    mask = (labels != ignore).astype(jnp.float32)
    loss_ref[0, 0] += jnp.sum((lse - picked) * mask)
    cnt_ref[0, 0] += jnp.sum(mask)


def _ce_bwd_kernel(ah_ref, aw_ref, x_ref, labels_ref, scale_ref, dx_ref, up_ref,
                   tmp_ref, *, c: int, ignore: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    ah_blk = ah_ref[:]
    aw = aw_ref[:]
    labels = labels_ref[0]
    scale = scale_ref[0, 0]  # g / count
    _fill_up_scratch(ah_blk, aw, x_ref, up_ref, tmp_ref, c)

    up = up_ref[:]
    _, _, e, s = _lse_and_picked(up, labels)
    cls = jax.lax.broadcasted_iota(jnp.int32, up.shape, 0)
    onehot = (cls == labels[None]).astype(jnp.float32)
    mask_scale = jnp.where(labels != ignore, scale, 0.0)
    up_ref[:] = (e / s[None] - onehot) * mask_scale[None]  # d_up, in place
    _accum_dx(ah_blk, aw, up_ref, dx_ref, tmp_ref, c)


def _accum_dx(ah_blk, aw, up_ref, dx_ref, tmp_ref, c):
    """dX_k (Hin, Win) += Ah_blkᵀ @ (d_up_k @ Aw), with the dominant W
    contraction batched over classes as one (C·BP, W) @ Aw matmul (see
    `_fill_up_scratch`)."""
    bp, w_in = tmp_ref.shape[1], tmp_ref.shape[2]
    w_out = aw.shape[0]
    if bp % 8 == 0:
        tmp_ref[:] = _dot(up_ref[:].reshape(c * bp, w_out), aw
                          ).reshape(c, bp, w_in)
    else:
        for k in range(c):
            tmp_ref[k] = _dot(up_ref[k], aw)
    ah_b = jnp.broadcast_to(ah_blk, (c,) + ah_blk.shape)
    dx_ref[0] += jax.lax.dot_general(
        ah_b, tmp_ref[:], (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)


def _specs(n, h_in, w_in, c, h_out, w_out, bp):
    in_specs = [
        pl.BlockSpec((bp, h_in), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((w_out, w_in), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c, h_in, w_in), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bp, w_out), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((c, bp, w_out), jnp.float32),
        pltpu.VMEM((c, bp, w_in), jnp.float32),
    ]
    return in_specs, scratch


def _run_fwd(logits, labels, out_size, ignore):
    n, h_in, w_in, c = logits.shape
    h_out, w_out = out_size
    bp = _pick_block(h_out)
    ah = interp_matrix_align_corners(h_in, h_out)
    aw = interp_matrix_align_corners(w_in, w_out)
    x_cm = jnp.transpose(logits, (0, 3, 1, 2))  # channel-major (N,C,Hin,Win)
    in_specs, scratch = _specs(n, h_in, w_in, c, h_out, w_out, bp)
    kernel = functools.partial(_ce_fwd_kernel, c=c, ignore=ignore)
    loss_sum, cnt = pl.pallas_call(
        kernel,
        grid=(n, h_out // bp),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=_use_interpret(),
    )(ah, aw, x_cm, labels.astype(jnp.int32))
    return loss_sum[0, 0], cnt[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def upsampled_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      out_size: Tuple[int, int], ignore_index: int = 255):
    """mean CE(resize_align_corners(logits, out_size), labels) with ignore.

    logits (N,h,w,C) any float dtype; labels (N,H,W) int. Equals the
    reference CriterionDSN head term in f32 arithmetic.
    """
    loss_sum, cnt = _run_fwd(logits, labels, out_size, ignore_index)
    return loss_sum / jnp.maximum(cnt, 1.0)


def _fwd(logits, labels, out_size, ignore_index):
    loss_sum, cnt = _run_fwd(logits, labels, out_size, ignore_index)
    return loss_sum / jnp.maximum(cnt, 1.0), (logits, labels, cnt)


def _bwd(out_size, ignore_index, residuals, g):
    logits, labels, cnt = residuals
    n, h_in, w_in, c = logits.shape
    h_out, w_out = out_size
    bp = _pick_block(h_out)
    ah = interp_matrix_align_corners(h_in, h_out)
    aw = interp_matrix_align_corners(w_in, w_out)
    x_cm = jnp.transpose(logits, (0, 3, 1, 2))
    scale = (g.astype(jnp.float32) / jnp.maximum(cnt, 1.0)).reshape(1, 1)
    in_specs, scratch = _specs(n, h_in, w_in, c, h_out, w_out, bp)
    in_specs = in_specs + [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
    ]
    kernel = functools.partial(_ce_bwd_kernel, c=c, ignore=ignore_index)
    dx_cm = pl.pallas_call(
        kernel,
        grid=(n, h_out // bp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c, h_in, w_in), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, h_in, w_in), logits.dtype),
        scratch_shapes=scratch,
        interpret=_use_interpret(),
    )(ah, aw, x_cm, labels.astype(jnp.int32), scale)
    return jnp.transpose(dx_cm, (0, 2, 3, 1)), None


upsampled_ce_loss.defvjp(_fwd, _bwd)


# --------------------------------------------------------------- dual (DSN)
# One pass over the concatenated [main ‖ aux] channels (2C = 38 for
# Cityscapes): the interpolation operators, labels, and ignore mask are
# loaded/computed once for both heads, and fwd+bwd each run as a single
# kernel launch instead of two (reference computes the two CE terms
# separately, utils/criterion.py:179-188 — semantics identical).


def _ce_dsn_fwd_kernel(ah_ref, aw_ref, x_ref, labels_ref, loss_ref, cnt_ref,
                       up_ref, tmp_ref, *, c: int, ignore: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        loss_ref[0, 0] = jnp.float32(0.0)
        loss_ref[0, 1] = jnp.float32(0.0)
        cnt_ref[0, 0] = jnp.float32(0.0)

    ah_blk = ah_ref[:]
    aw = aw_ref[:]
    labels = labels_ref[0]
    _fill_up_scratch(ah_blk, aw, x_ref, up_ref, tmp_ref, 2 * c)

    mask = (labels != ignore).astype(jnp.float32)
    cnt_ref[0, 0] += jnp.sum(mask)
    for head in range(2):
        lse, picked, _, _ = _lse_and_picked(
            up_ref[head * c:(head + 1) * c], labels)
        loss_ref[0, head] += jnp.sum((lse - picked) * mask)


def _ce_dsn_bwd_kernel(ah_ref, aw_ref, x_ref, labels_ref, scale_ref, dx_ref,
                       up_ref, tmp_ref, *, c: int, ignore: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    ah_blk = ah_ref[:]
    aw = aw_ref[:]
    labels = labels_ref[0]
    _fill_up_scratch(ah_blk, aw, x_ref, up_ref, tmp_ref, 2 * c)

    valid = labels != ignore
    for head in range(2):
        base = head * c
        scale = scale_ref[0, head]  # g/count for main, g*dsn_weight/count aux
        up = up_ref[base:base + c]
        _, _, e, s = _lse_and_picked(up, labels)
        cls = jax.lax.broadcasted_iota(jnp.int32, up.shape, 0)
        onehot = (cls == labels[None]).astype(jnp.float32)
        mask_scale = jnp.where(valid, scale, 0.0)
        up_ref[base:base + c] = (e / s[None] - onehot) * mask_scale[None]
    _accum_dx(ah_blk, aw, up_ref, dx_ref, tmp_ref, 2 * c)


def _run_dsn_fwd(x_cm, labels, out_size, ignore):
    n, c2, h_in, w_in = x_cm.shape
    c = c2 // 2
    h_out, w_out = out_size
    bp = _pick_block(h_out)
    ah = interp_matrix_align_corners(h_in, h_out)
    aw = interp_matrix_align_corners(w_in, w_out)
    in_specs, scratch = _specs(n, h_in, w_in, c2, h_out, w_out, bp)
    kernel = functools.partial(_ce_dsn_fwd_kernel, c=c, ignore=ignore)
    loss_sums, cnt = pl.pallas_call(
        kernel,
        grid=(n, h_out // bp),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=_use_interpret(),
    )(ah, aw, x_cm, labels.astype(jnp.int32))
    return loss_sums[0], cnt[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def upsampled_ce_loss_dsn(logits, aux_logits, labels, out_size,
                          ignore_index: int = 255, dsn_weight: float = 0.4):
    """CE(main↑) + dsn_weight·CE(aux↑) in ONE kernel pass over 2C channels."""
    x_cm = jnp.transpose(
        jnp.concatenate([logits, aux_logits], axis=-1), (0, 3, 1, 2))
    sums, cnt = _run_dsn_fwd(x_cm, labels, out_size, ignore_index)
    cnt = jnp.maximum(cnt, 1.0)
    return sums[0] / cnt + dsn_weight * (sums[1] / cnt)


def _dsn_fwd(logits, aux_logits, labels, out_size, ignore_index, dsn_weight):
    x_cm = jnp.transpose(
        jnp.concatenate([logits, aux_logits], axis=-1), (0, 3, 1, 2))
    sums, cnt = _run_dsn_fwd(x_cm, labels, out_size, ignore_index)
    cnt = jnp.maximum(cnt, 1.0)
    loss = sums[0] / cnt + dsn_weight * (sums[1] / cnt)
    return loss, (x_cm, labels, cnt)


def _dsn_bwd(out_size, ignore_index, dsn_weight, residuals, g):
    x_cm, labels, cnt = residuals
    n, c2, h_in, w_in = x_cm.shape
    c = c2 // 2
    h_out, w_out = out_size
    bp = _pick_block(h_out)
    ah = interp_matrix_align_corners(h_in, h_out)
    aw = interp_matrix_align_corners(w_in, w_out)
    gf = g.astype(jnp.float32) / cnt
    scale = jnp.stack([gf, gf * dsn_weight]).reshape(1, 2)
    in_specs, scratch = _specs(n, h_in, w_in, c2, h_out, w_out, bp)
    in_specs = in_specs + [
        pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
    ]
    kernel = functools.partial(_ce_dsn_bwd_kernel, c=c, ignore=ignore_index)
    dx_cm = pl.pallas_call(
        kernel,
        grid=(n, h_out // bp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c2, h_in, w_in), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c2, h_in, w_in), x_cm.dtype),
        scratch_shapes=scratch,
        interpret=_use_interpret(),
    )(ah, aw, x_cm, labels.astype(jnp.int32), scale)
    dx = jnp.transpose(dx_cm, (0, 2, 3, 1))
    return dx[..., :c], dx[..., c:], None


upsampled_ce_loss_dsn.defvjp(_dsn_fwd, _dsn_bwd)
