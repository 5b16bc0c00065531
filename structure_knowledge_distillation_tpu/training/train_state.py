"""Train state and optimizers for the KD pipeline.

One pytree carries everything the jitted step needs: frozen teacher variables,
student params + BN statistics, discriminator params + BN statistics +
spectral-norm power-iteration state, and both optax optimizer states. The
reference's equivalents are the `NetModel` attributes and two torch SGD
optimizers (reference networks/kd_model.py:53-95).

Optimizer semantics match torch SGD with weight decay + momentum and the
poly learning-rate schedule lr·(1−step/num_steps)^power (reference
kd_model.py:110-117): decay is added to the gradient *before* the momentum
buffer, update = −lr·buf.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

__all__ = ["KDTrainState", "poly_schedule", "make_sgd", "make_flat_sgd",
           "create_train_state"]


def poly_schedule(base_lr: float, num_steps: int, power: float) -> Callable:
    def schedule(count):
        # integer subtraction first: exact near the end of the schedule, where
        # 1.0 - count/num_steps cancels catastrophically in f32
        remaining = num_steps - jnp.minimum(count, num_steps)
        frac = remaining.astype(jnp.float32) / num_steps
        return base_lr * (frac ** power)

    return schedule


def make_sgd(base_lr: float, num_steps: int, power: float, momentum: float,
             weight_decay: float, flat: bool = False) -> optax.GradientTransformation:
    if flat:
        return make_flat_sgd(base_lr, num_steps, power, momentum, weight_decay)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=poly_schedule(base_lr, num_steps, power),
                  momentum=momentum),
    )


class FlatSGDState(NamedTuple):
    count: jnp.ndarray  # schedule step (same role as ScaleByScheduleState)
    buf: jnp.ndarray    # single f32 momentum vector over all leaves


def make_flat_sgd(base_lr: float, num_steps: int, power: float,
                  momentum: float, weight_decay: float) -> optax.GradientTransformation:
    """torch-SGD semantics with ONE momentum vector for the whole tree.

    Motivation: the per-leaf optax chain lowers to ~5 tiny XLA ops per
    parameter leaf (~900 sub-5µs device ops per train step across both
    optimizers). MEASURED NEGATIVE on v5e (full-recipe bench 147.96 vs
    150.68 img/s): inside the scanned program those tiny ops are
    device-scheduled, not host launches, and the flat form's extra
    concat/slice HBM traffic (~100 MB/step) outweighs the op-count saving.
    Ships flag-off (`--flat-sgd`) as a recorded negative, like
    `stem_patches_conv1`. Numerically identical to
    `optax.chain(add_decayed_weights, sgd)` (decay added to the gradient
    BEFORE the momentum buffer, update = −lr·buf, reference
    kd_model.py:59-66) — regression-tested against the per-leaf chain
    leaf-for-leaf."""
    sched = poly_schedule(base_lr, num_steps, power)

    def init(params):
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        return FlatSGDState(jnp.zeros((), jnp.int32), jnp.zeros((n,), jnp.float32))

    def update(grads, state, params):
        g_leaves, treedef = jax.tree.flatten(grads)
        p_leaves = jax.tree.leaves(params)
        flat_g = jnp.concatenate([g.ravel().astype(jnp.float32)
                                  for g in g_leaves])
        flat_p = jnp.concatenate([p.ravel().astype(jnp.float32)
                                  for p in p_leaves])
        buf = flat_g + weight_decay * flat_p + momentum * state.buf
        flat_u = -sched(state.count) * buf
        updates, off = [], 0
        for g in g_leaves:
            n = int(np.prod(g.shape))
            updates.append(flat_u[off:off + n].reshape(g.shape).astype(g.dtype))
            off += n
        return (jax.tree.unflatten(treedef, updates),
                FlatSGDState(state.count + 1, buf))

    return optax.GradientTransformation(init, update)


class KDTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array

    teacher_params: Any
    teacher_stats: Any

    student_params: Any
    student_stats: Any

    d_params: Any
    d_stats: Any
    d_spectral: Any

    g_opt: optax.OptState
    d_opt: optax.OptState


def create_train_state(
    rng: jax.Array,
    teacher_vars: dict,
    student_vars: dict,
    d_vars: dict,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    last_step: int = 0,
) -> KDTrainState:
    g_opt = g_tx.init(student_vars["params"])
    d_opt = d_tx.init(d_vars.get("params", {}))
    if last_step:
        # Advance the schedule counters so a resumed run continues the poly lr
        # exactly where the unbroken run would be (reference resumes offset
        # the loop index the same way: utils/utils.py:112, train_and_eval.py:21).
        g_opt = _set_schedule_count(g_opt, last_step)
        d_opt = _set_schedule_count(d_opt, last_step)
    return KDTrainState(
        step=jnp.asarray(last_step, jnp.int32),
        rng=rng,
        teacher_params=teacher_vars.get("params", {}),
        teacher_stats=teacher_vars.get("batch_stats", {}),
        student_params=student_vars["params"],
        student_stats=student_vars.get("batch_stats", {}),
        d_params=d_vars.get("params", {}),
        d_stats=d_vars.get("batch_stats", {}),
        d_spectral=d_vars.get("spectral", {}),
        g_opt=g_opt,
        d_opt=d_opt,
    )


def _set_schedule_count(opt_state, count: int):
    """Set every `count` field (ScaleByScheduleState) in an optax state."""
    def is_count_state(node):
        return hasattr(node, "_fields") and "count" in node._fields

    def fix(node):
        if is_count_state(node):
            return node._replace(count=jnp.asarray(count, jnp.int32))
        return node

    return jax.tree.map(fix, opt_state, is_leaf=is_count_state)
