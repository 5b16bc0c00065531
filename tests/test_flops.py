"""utils/flops.py — the MFU numerator (structural conv+dot FLOP count).

Gated hand-computable cases: a plain dot, batched dot_general, forward and
strided convs (with the lhs-dilation normalization for data-grads), scan
multiplication, and an XLA cross-check on a dot-only function (XLA's cost
analysis DOES count dots — it is convs it omits on TPU, which is the whole
reason this module exists; see bench.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structure_knowledge_distillation_tpu.utils.flops import (
    flops_of_fn,
    flops_of_jaxpr,
)


def test_dot_flops_exact():
    a = jnp.zeros((32, 64), jnp.float32)
    b = jnp.zeros((64, 16), jnp.float32)
    assert flops_of_fn(lambda a, b: a @ b, a, b) == 2 * 32 * 64 * 16


def test_batched_dot_general_flops_exact():
    a = jnp.zeros((4, 8, 16), jnp.float32)
    b = jnp.zeros((4, 16, 5), jnp.float32)
    fn = lambda a, b: jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))))
    assert flops_of_fn(fn, a, b) == 2 * 4 * 8 * 16 * 5


def test_conv_flops_exact():
    # NHWC 3x3 SAME stride 1: 2 * N*H*W * Cout * Cin * 9
    x = jnp.zeros((2, 16, 16, 8), jnp.float32)
    k = jnp.zeros((3, 3, 8, 4), jnp.float32)
    fn = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert flops_of_fn(fn, x, k) == 2 * 2 * 16 * 16 * 4 * 8 * 9


def test_strided_conv_grad_counts_like_forward():
    """The data-grad of a strided conv is an lhs-dilated conv; the
    1/prod(lhs_dilation) normalization must make fwd+bwd ≈ 3× fwd (one
    data-grad + one weight-grad, each the same MACs as the forward) —
    without it the stride-2 data-grad would count 4× too much."""
    x = jnp.zeros((1, 16, 16, 8), jnp.float32)
    k = jnp.zeros((3, 3, 8, 4), jnp.float32)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    fwd = flops_of_fn(conv, x, k)
    assert fwd == 2 * 1 * 8 * 8 * 4 * 8 * 9  # out is 8x8 at stride 2

    def loss(x, k):
        return conv(x, k).sum()

    both = flops_of_fn(lambda x, k: jax.grad(loss, argnums=(0, 1))(x, k), x, k)
    # jax.grad traces primal + data-grad + weight-grad: with the
    # lhs-dilation normalization each grad conv counts exactly like the
    # forward (measured exactly 3.0× here); without it the stride-2
    # data-grad alone would count 4× the forward.
    assert 2.6 * fwd <= both <= 3.4 * fwd, (fwd, both)


def test_scan_multiplies_body():
    w = jnp.zeros((8, 8), jnp.float32)

    def fn(w):
        def body(c, _):
            return c @ w, ()

        out, _ = jax.lax.scan(body, w, None, length=5)
        return out

    assert flops_of_fn(fn, w) == 5 * 2 * 8 * 8 * 8


def test_recurses_into_jit_and_remat():
    w = jnp.zeros((8, 8), jnp.float32)
    inner = jax.jit(lambda a: a @ a)
    assert flops_of_fn(lambda a: inner(a), w) == 2 * 8 * 8 * 8
    rem = jax.checkpoint(lambda a: (a @ a).sum())
    # value_and_grad under remat: fwd (1) + recompute (1) + two grads (~2)
    got = flops_of_fn(lambda a: jax.value_and_grad(rem)(a), w)
    assert got >= 3 * 2 * 8 * 8 * 8, got


def test_matches_xla_cost_analysis_on_dots():
    """XLA's cost analysis is trustworthy for dot-only programs (it is convs
    it omits) — the structural count must agree exactly there."""
    a = jnp.zeros((64, 128), jnp.float32)
    b = jnp.zeros((128, 32), jnp.float32)

    def fn(a, b):
        return ((a @ b).T @ a).sum()

    compiled = jax.jit(fn).lower(a, b).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    if not cost or "flops" not in cost:
        pytest.skip("backend reports no cost analysis")
    ours = flops_of_fn(fn, a, b)
    # XLA may add epsilon flops for the reduction; dots dominate
    assert abs(cost["flops"] - ours) / ours < 0.05, (cost["flops"], ours)


def test_kd_train_step_flops_scale():
    """The full (tiny) KD step's count lands in the physically sensible
    band: ≥ 3× the teacher+student forward cost and within 10× of it —
    a gate that the recursion actually reaches the step's conv guts."""
    from structure_knowledge_distillation_tpu.config import TrainConfig
    from structure_knowledge_distillation_tpu.models import (
        Discriminator,
        ResPSPNet,
    )
    from structure_knowledge_distillation_tpu.training import (
        create_train_state,
        make_sgd,
        make_train_step,
    )

    cfg = TrainConfig(classes_num=19, batch_size=2, input_size=(64, 64),
                      num_steps=10, imsize_for_adv=9, fused_ce="false",
                      compute_dtype="float32")
    teacher = ResPSPNet(block="bottleneck", layers=(1, 1, 1, 1), num_classes=19)
    student = ResPSPNet(block="basic", layers=(1, 1, 1, 1), num_classes=19)
    disc = Discriminator(preprocess_mode=1, image_size=9, conv_dim=8)
    key = jax.random.PRNGKey(0)
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    labels = jnp.zeros((2, 64, 64), jnp.int32)
    t_vars = jax.eval_shape(lambda: teacher.init(key, images[:1], train=False))
    t_vars = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), t_vars)
    s_vars = jax.eval_shape(lambda: student.init(key, images[:1], train=False))
    s_vars = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), s_vars)
    d_vars = jax.eval_shape(
        lambda: disc.init(key, jnp.zeros((1, 9, 9, 19)), train=False))
    d_vars = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), d_vars)
    g_tx = make_sgd(0.01, 10, 0.9, 0.9, 5e-4)
    d_tx = make_sgd(0.01, 10, 0.9, 0.9, 5e-4)
    state = create_train_state(key, t_vars, s_vars, d_vars, g_tx, d_tx)
    step_fn = make_train_step(cfg, teacher, student, disc, g_tx, d_tx)

    step_flops = flops_of_fn(step_fn, state, images, labels)

    t_fwd = flops_of_fn(
        lambda v, x: teacher.apply(v, x, train=False)[0], t_vars, images)
    s_fwd = flops_of_fn(
        lambda v, x: student.apply(v, x, train=False)[0], s_vars, images)
    base = t_fwd + s_fwd
    assert step_flops >= t_fwd + 3.0 * s_fwd, (step_flops, t_fwd, s_fwd)
    assert step_flops <= 10.0 * base, (step_flops, base)
    # and the jaxpr-level API agrees with the fn-level one
    shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
        (state, images, labels))
    assert flops_of_jaxpr(jax.make_jaxpr(step_fn)(*shapes)) == step_flops
