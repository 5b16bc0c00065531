"""Rematerialization (`--remat`) parity: per-block jax.checkpoint must change
memory behavior only — every forward value, BN stat, gradient, and post-step
parameter must match the non-remat path.

The reference's memory lever was the in-place ABN (libs/functions.py:214-221),
which XLA buffer reuse subsumes; remat is the TPU-native lever beyond it
(bigger batches/crops on fixed HBM). No reference counterpart — numerics are
therefore pinned to our own non-remat path, which IS torch-oracle-verified
(tests/test_torch_forward_parity.py, tests/test_composite_step_oracle.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from structure_knowledge_distillation_tpu.config import TrainConfig
from structure_knowledge_distillation_tpu.models import ResPSPNet, Discriminator
from structure_knowledge_distillation_tpu.training import (
    create_train_state,
    make_sgd,
    make_train_step,
)

IN = (2, 96, 96, 3)


def _models():
    base = dict(block="basic", layers=(1, 1, 1, 1), num_classes=7)
    return ResPSPNet(**base), ResPSPNet(**base, remat=True)


def test_remat_init_tree_identical():
    plain, remat = _models()
    x = jnp.zeros((1,) + IN[1:], jnp.float32)
    v0 = plain.init(jax.random.PRNGKey(0), x, train=False)
    v1 = remat.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_forward_stats_and_grads_match():
    plain, remat = _models()
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, IN, jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x[:1], train=False)

    def run(model, params):
        outs, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return outs, mut["batch_stats"]

    outs0, stats0 = run(plain, variables["params"])
    outs1, stats1 = run(remat, variables["params"])
    for i, (a, b) in enumerate(zip(outs0, outs1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=f"output {i}")
    for a, b in zip(jax.tree.leaves(stats0), jax.tree.leaves(stats1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def loss(model, params):
        outs, _ = run(model, params)
        return (jnp.mean(outs[0].astype(jnp.float32) ** 2)
                + jnp.mean(outs[1].astype(jnp.float32) ** 2))

    g0 = jax.grad(lambda p: loss(plain, p))(variables["params"])
    g1 = jax.grad(lambda p: loss(remat, p))(variables["params"])
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert p0 == p1
        a, b = np.asarray(a), np.asarray(b)
        # identical math, different op schedule (remat re-runs the forward
        # inside the backward behind an optimization barrier) — allow float
        # reassociation noise relative to the leaf's own scale
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(p0))


def test_remat_train_step_matches_plain():
    """One full make_train_step (CE-DSN + Pi + Pa, G update) with the real
    shallow architectures: the remat student must produce the same losses and
    post-step parameters as the plain student."""
    cfg = TrainConfig(classes_num=7, batch_size=2, input_size=(96, 96),
                      num_steps=10, pi=True, pa=True, ho=False,
                      compute_dtype="float32", fused_ce="false")
    teacher = ResPSPNet(block="bottleneck", layers=(1, 1, 1, 1), num_classes=7)
    disc = Discriminator(preprocess_mode=1, image_size=13, conv_dim=8)
    key = jax.random.PRNGKey(0)
    images = jax.random.normal(key, IN, jnp.float32)
    labels = jax.random.randint(key, IN[:3], 0, 7)
    t_vars = teacher.init(key, images[:1], train=False)
    d_vars = disc.init(key, jnp.zeros((1, 13, 13, 7)), train=False)
    g_tx = make_sgd(cfg.lr_g, cfg.num_steps, cfg.power, cfg.momentum,
                    cfg.weight_decay)
    d_tx = make_sgd(cfg.lr_d, cfg.num_steps, cfg.power, cfg.momentum,
                    cfg.weight_decay)

    results = []
    for student in _models():
        s_vars = student.init(jax.random.PRNGKey(3), images[:1], train=False)
        state = create_train_state(jax.random.PRNGKey(7), t_vars, s_vars,
                                   d_vars, g_tx, d_tx)
        step = jax.jit(make_train_step(cfg, teacher, student, disc, g_tx, d_tx))
        new_state, metrics = step(state, images, labels)
        results.append((new_state, metrics))

    (s0, m0), (s1, m1) = results
    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]), rtol=1e-5,
                                   err_msg=k)
    for a, b in zip(jax.tree.leaves(s0.student_params),
                    jax.tree.leaves(s1.student_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
