"""Pallas upsampled-CE kernel vs the exact XLA criterion (values + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structure_knowledge_distillation_tpu.losses.task import cross_entropy_ignore
from structure_knowledge_distillation_tpu.ops.pallas_ce import upsampled_ce_loss
from structure_knowledge_distillation_tpu.ops.resize import resize_bilinear_align_corners


def _ref_loss(logits, labels, out_size):
    up = resize_bilinear_align_corners(logits.astype(jnp.float32), out_size)
    return cross_entropy_ignore(up, labels)


@pytest.mark.parametrize("hin,hout", [((9, 9), (64, 64)), ((13, 17), (32, 64))])
def test_pallas_ce_matches_reference(hin, hout):
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, *hin, 19).astype(np.float32))
    labels = rng.randint(0, 19, (2, *hout))
    labels[0, :5] = 255
    labels = jnp.asarray(labels)
    ours = upsampled_ce_loss(logits, labels, hout, 255)
    ref = _ref_loss(logits, labels, hout)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_pallas_ce_unaligned_block_fallback():
    """Output heights with no multiple-of-8 block divisor (bp % 8 != 0) take
    the per-class width loop instead of the class-batched reshape matmul —
    values and grads must still match the XLA criterion."""
    rng = np.random.RandomState(7)
    out = (20, 36)  # _pick_block(20) -> 20, not a multiple of 8
    logits = jnp.asarray(rng.randn(2, 5, 9, 6).astype(np.float32))
    labels = rng.randint(0, 6, (2, *out))
    labels[0, :3] = 255
    labels = jnp.asarray(labels)
    ours = upsampled_ce_loss(logits, labels, out, 255)
    ref = _ref_loss(logits, labels, out)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    g_ours = jax.grad(lambda l: upsampled_ce_loss(l, labels, out, 255))(logits)
    g_ref = jax.grad(lambda l: _ref_loss(l, labels, out))(logits)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_pallas_ce_grad_matches_reference():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 9, 9, 7).astype(np.float32))
    labels = rng.randint(0, 7, (2, 32, 32))
    labels[1, -4:] = 255
    labels = jnp.asarray(labels)
    g_ours = jax.grad(lambda l: upsampled_ce_loss(l, labels, (32, 32), 255))(logits)
    g_ref = jax.grad(lambda l: _ref_loss(l, labels, (32, 32)))(logits)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_pallas_ce_bf16_logits():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(1, 9, 9, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, (1, 32, 32)))
    exact = float(upsampled_ce_loss(logits, labels, (32, 32), 255))
    lo = float(upsampled_ce_loss(logits.astype(jnp.bfloat16), labels, (32, 32), 255))
    assert abs(exact - lo) / abs(exact) < 2e-2
    g = jax.grad(lambda l: upsampled_ce_loss(l, labels, (32, 32), 255))(
        logits.astype(jnp.bfloat16))
    assert g.dtype == jnp.bfloat16 and np.isfinite(np.asarray(g, np.float32)).all()


def test_pallas_ce_all_ignored():
    logits = jnp.zeros((1, 9, 9, 5))
    labels = jnp.full((1, 32, 32), 255)
    assert np.isfinite(float(upsampled_ce_loss(logits, labels, (32, 32), 255)))


def test_vmem_guard_falls_back_for_huge_resolutions():
    from structure_knowledge_distillation_tpu.ops.pallas_ce import kernel_vmem_bytes
    from structure_knowledge_distillation_tpu.losses.task import criterion_dsn_fused

    # flagship training shape fits comfortably
    assert kernel_vmem_bytes((8, 65, 65, 19), (512, 512)) < 12 * 1024 * 1024
    # full-res training would not; the fused criterion must still work (falls
    # back to the XLA path) — tiny channel count keeps this test fast
    logits = jnp.zeros((1, 129, 257, 19), jnp.float32)
    labels = jnp.zeros((1, 1024, 2048), jnp.int32)
    big = kernel_vmem_bytes(logits.shape, (1024, 2048))
    loss = criterion_dsn_fused((logits, logits), labels)
    assert np.isfinite(float(loss))


def test_pallas_ce_dsn_dual_matches_reference():
    """The one-pass dual-head kernel == CE(main↑) + 0.4·CE(aux↑), values and
    BOTH grads (reference CriterionDSN, utils/criterion.py:179-188)."""
    from structure_knowledge_distillation_tpu.ops.pallas_ce import (
        upsampled_ce_loss_dsn,
    )

    rng = np.random.RandomState(3)
    main = jnp.asarray(rng.randn(2, 9, 9, 7).astype(np.float32))
    aux = jnp.asarray(rng.randn(2, 9, 9, 7).astype(np.float32))
    labels = rng.randint(0, 7, (2, 32, 32))
    labels[0, :6] = 255
    labels = jnp.asarray(labels)

    def ref(m, a):
        return _ref_loss(m, labels, (32, 32)) + 0.4 * _ref_loss(a, labels, (32, 32))

    ours = upsampled_ce_loss_dsn(main, aux, labels, (32, 32), 255, 0.4)
    np.testing.assert_allclose(float(ours), float(ref(main, aux)), rtol=1e-5)

    g_ours = jax.grad(
        lambda m, a: upsampled_ce_loss_dsn(m, a, labels, (32, 32), 255, 0.4),
        argnums=(0, 1))(main, aux)
    g_ref = jax.grad(ref, argnums=(0, 1))(main, aux)
    for i in range(2):
        np.testing.assert_allclose(np.asarray(g_ours[i]), np.asarray(g_ref[i]),
                                   rtol=1e-4, atol=1e-6, err_msg=f"head {i}")


def test_pallas_ce_randomized_sweep():
    """Randomized shape/class/ignore sweep of the kernel vs the XLA oracle.

    Covers what the fixed-shape cases cannot: arbitrary in/out aspect ratios
    (both up- and non-integer scale factors), class counts off the lane
    boundary, ignore fractions from 0 to ~1, and both block-divisor branches
    of the kernel (class-batched matmul vs per-class width loop)."""
    rng = np.random.RandomState(42)
    for trial in range(6):
        b = int(rng.randint(1, 3))
        hin = (int(rng.randint(4, 14)), int(rng.randint(4, 14)))
        hout = (int(rng.randint(16, 49)), int(rng.randint(16, 49)))
        c = int(rng.randint(2, 22))
        logits = jnp.asarray(rng.randn(b, *hin, c).astype(np.float32))
        labels = rng.randint(0, c, (b, *hout))
        # ignore fraction 0, ~30%, or ~95% depending on trial
        frac = [0.0, 0.3, 0.95][trial % 3]
        mask = rng.rand(*labels.shape) < frac
        labels[mask] = 255
        labels = jnp.asarray(labels)
        msg = f"trial {trial}: b={b} in={hin} out={hout} c={c} frac={frac}"
        ours = upsampled_ce_loss(logits, labels, hout, 255)
        ref = _ref_loss(logits, labels, hout)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4,
                                   err_msg=msg)
        g_ours = jax.grad(lambda l: upsampled_ce_loss(l, labels, hout, 255))(logits)
        g_ref = jax.grad(lambda l: _ref_loss(l, labels, hout))(logits)
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-5, err_msg=msg)


def test_criterion_dsn_fused_uses_dual_pass():
    from structure_knowledge_distillation_tpu.losses.task import (
        criterion_dsn, criterion_dsn_fused,
    )

    rng = np.random.RandomState(4)
    main = jnp.asarray(rng.randn(1, 9, 9, 5).astype(np.float32))
    aux = jnp.asarray(rng.randn(1, 9, 9, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, (1, 32, 32)))
    fused = criterion_dsn_fused((main, aux), labels)
    exact = criterion_dsn((main, aux), labels)
    np.testing.assert_allclose(float(fused), float(exact), rtol=1e-5)
