"""Fused upsample+argmax eval kernel vs the XLA resize+argmax oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structure_knowledge_distillation_tpu.ops.pallas_eval import (
    argmax_kernel_fits,
    upsampled_argmax,
)
from structure_knowledge_distillation_tpu.ops.resize import (
    resize_bilinear_align_corners,
)


def _oracle(logits, out_size):
    up = resize_bilinear_align_corners(logits.astype(jnp.float32), out_size)
    return jnp.argmax(up, axis=-1)


@pytest.mark.parametrize("hin,hout", [((9, 9), (64, 64)), ((13, 17), (32, 64))])
def test_upsampled_argmax_matches_oracle(hin, hout):
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, *hin, 19).astype(np.float32))
    ours = np.asarray(upsampled_argmax(logits, hout))
    ref = np.asarray(_oracle(logits, hout))
    # identical interp matrices on both paths; allow a vanishing number of
    # float-association near-ties
    assert (ours != ref).mean() < 1e-3


def test_upsampled_argmax_bf16_logits():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 9, 9, 7).astype(np.float32))
    a = np.asarray(upsampled_argmax(logits.astype(jnp.bfloat16), (32, 32)))
    b = np.asarray(_oracle(logits.astype(jnp.bfloat16), (32, 32)))
    assert (a != b).mean() < 1e-3


def test_upsampled_argmax_tie_breaks_to_first_index():
    """Exactly tied classes resolve to the LOWEST class index, matching
    jnp.argmax / torch argmax semantics."""
    base = np.random.RandomState(2).randn(1, 5, 7, 1).astype(np.float32)
    logits = jnp.asarray(np.repeat(base, 4, axis=-1))  # all 4 classes tied
    pred = np.asarray(upsampled_argmax(logits, (32, 28)))
    assert (pred == 0).all()


def test_vmem_gate():
    assert argmax_kernel_fits((1, 129, 257, 19), (1024, 2048))
    assert not argmax_kernel_fits((1, 129, 257, 512), (4096, 8192))
    # small outputs measured slower with the kernel — gated off
    assert not argmax_kernel_fits((1, 65, 65, 19), (512, 512))


def test_fast_val_fn_uses_oracle_path_off_tpu():
    """On CPU the fast val fn must take the XLA path (kernel is TPU-gated)
    and still produce a correct confusion matrix."""
    from flax import linen as nn

    from structure_knowledge_distillation_tpu.training.evaluate import (
        make_fast_val_fn,
    )

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(6, (1, 1))(x[:, ::8, ::8, :])

    model = Tiny()
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    fn = make_fast_val_fn(model, (64, 64), 6)
    label = jnp.zeros((64, 64), jnp.int32)
    pred, conf = fn(variables, x, label, jnp.int32(64), jnp.int32(64))
    assert pred.shape == (64, 64) and conf.shape == (6, 6)
    assert int(conf.sum()) == 64 * 64


def test_upsampled_argmax_randomized_sweep():
    """Random shape/class sweep vs the oracle, including quantized logits
    (coarse value grid => many exact ties after interpolation) to stress the
    first-index tie-break at arbitrary block splits."""
    rng = np.random.RandomState(11)
    for trial in range(6):
        b = int(rng.randint(1, 3))
        hin = (int(rng.randint(4, 16)), int(rng.randint(4, 16)))
        # kernel row blocks need h_out % 8 == 0 (production outputs are
        # full-res; argmax_kernel_fits gates everything else)
        hout = (8 * int(rng.randint(2, 10)), int(rng.randint(16, 72)))
        c = int(rng.randint(2, 24))
        vals = rng.randn(b, *hin, c).astype(np.float32)
        if trial % 2:  # quantize to force exact ties post-interpolation
            vals = np.round(vals * 2.0) / 2.0
        logits = jnp.asarray(vals)
        ours = np.asarray(upsampled_argmax(logits, hout))
        ref = np.asarray(_oracle(logits, hout))
        msg = (f"trial {trial}: b={b} in={hin} out={hout} c={c} "
               f"quant={bool(trial % 2)}")
        diff = ours != ref
        assert diff.mean() < 5e-3, f"{msg} mismatch={diff.mean()}"
        if diff.any():
            # every disagreement must be a genuine value tie between the two
            # chosen classes (float association order differs between the
            # kernel's matmul path and the oracle's resize) — never a wrong
            # class winning by a real margin
            up = np.asarray(resize_bilinear_align_corners(
                logits.astype(jnp.float32), hout))
            ii = np.nonzero(diff)
            gap = np.abs(up[(*ii, ours[diff])] - up[(*ii, ref[diff])])
            assert gap.max() < 1e-5, f"{msg} max tie gap {gap.max()}"
