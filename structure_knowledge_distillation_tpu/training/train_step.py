"""The jitted KD train step — teacher fwd, 4-term G loss, D step with WGAN-GP.

This is the TPU-native counterpart of `NetModel.optimize_parameters`
(reference networks/kd_model.py:119-173). The whole step — teacher forward
under stop_gradient, student forward/backward with the DSN + Pi + Pa + Ho
losses, the G update, three discriminator applications, the WGAN gradient
penalty (a nested `jax.grad`, replacing torch's
autograd.grad(create_graph=True) double-backward), and the D update —
compiles into ONE XLA program. Under a `Mesh` with the batch sharded on the
`data` axis, every batch-norm statistic and gradient mean is automatically a
cross-replica (ICI) reduction: the reference's DataParallel criteria
(utils/parallel.py) and queue-based sync BN (libs/functions.py) have no code
counterpart here at all.

Fidelity notes (SURVEY.md §7 quirks catalog):
  * D's spectral u/v advance once per D application, 4×/step with Ho on
    (G-adv fwd, D(T), D(S), D(interp)); power iteration is input-independent,
    so the 4th update after the GP call is replicated exactly.
  * The D loss is λ_d·adv + λ_d·(λ_gp·gp) — λ_d multiplies both terms
    (reference kd_model.py:158-161).
  * The reference computes CE(teacher, labels) and discards it
    (kd_model.py:129) — dead compute, not reproduced.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from structure_knowledge_distillation_tpu.losses import (
    adv_loss_for_d,
    adv_loss_for_g,
    criterion_dsn,
    criterion_ohem_dsn,
    pairwise_affinity_loss,
    pixel_wise_kl,
)
from structure_knowledge_distillation_tpu.losses.task import criterion_dsn_fused


def _use_fused_ce(cfg) -> bool:
    flag = getattr(cfg, "fused_ce", "auto")
    if flag in (True, "true", "True"):
        return True
    if flag in (False, "false", "False"):
        return False
    return jax.default_backend() == "tpu"

__all__ = ["make_train_step", "make_train_loop"]

Metrics = Dict[str, jnp.ndarray]


def make_train_step(
    cfg,
    teacher,
    student,
    discriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
) -> Callable:
    """Builds the (jittable) train step for a TrainConfig and three modules."""

    def train_step(state, images: jnp.ndarray, labels: jnp.ndarray) -> Tuple[Any, Metrics]:
        # labels may arrive in the uint8 wire format (data.cast_batches);
        # widen once on device. u8-wire images carry the raw byte values —
        # re-subtract the BGR mean the host re-quantized away.
        labels = labels.astype(jnp.int32)
        if images.dtype == jnp.uint8:
            mean = jnp.asarray(
                getattr(cfg, "input_mean_bgr",
                        (104.00698793, 116.66876762, 122.67891434)),
                jnp.float32)
            images = images.astype(jnp.float32) - mean
        step_rng = jax.random.fold_in(state.rng, state.step)
        drop_rng, gp_rng = jax.random.split(step_rng)

        # --- Teacher forward: eval mode (running stats), frozen.
        with jax.named_scope("teacher_forward"):
            preds_t = teacher.apply(
                {"params": state.teacher_params, "batch_stats": state.teacher_stats},
                images, train=False,
            )
        logits_t = jax.lax.stop_gradient(preds_t[0])
        feat_t = jax.lax.stop_gradient(preds_t[2])

        # Cross-family distillation (e.g. ESPNet student, floor-stride, vs
        # PSPNet teacher, ceil-stride): align the teacher's stride-8 grid to
        # the student's. No-op for the reference R101→R18 pair. The student's
        # output grid is known statically via eval_shape.
        s_out_shapes = jax.eval_shape(
            lambda p: student.apply(
                {"params": p, "batch_stats": state.student_stats},
                images, train=True, rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )[0],
            state.student_params,
        )
        if logits_t.shape[1:3] != s_out_shapes[0].shape[1:3]:
            from structure_knowledge_distillation_tpu.ops.resize import (
                resize_bilinear_align_corners,
            )

            logits_t = resize_bilinear_align_corners(
                logits_t, s_out_shapes[0].shape[1:3])
            feat_t = resize_bilinear_align_corners(
                feat_t, s_out_shapes[2].shape[1:3])

        # --- G (student) loss and update.
        def g_loss_fn(s_params):
            preds_s, s_mut = student.apply(
                {"params": s_params, "batch_stats": state.student_stats},
                images, train=True,
                rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )
            if getattr(cfg, "ohem", False):
                mc = criterion_ohem_dsn(preds_s, labels, cfg.ignore_label,
                                        cfg.ohem_thresh, cfg.ohem_min_kept)
            elif _use_fused_ce(cfg):
                mc = criterion_dsn_fused(preds_s, labels, cfg.ignore_label)
            else:
                mc = criterion_dsn(preds_s, labels, cfg.ignore_label)
            loss = mc
            metrics = {"mc_loss": mc}
            if cfg.pi:
                pi_l = pixel_wise_kl(preds_s[0], logits_t)
                metrics["pi_loss"] = pi_l
                loss = loss + cfg.lambda_pi * pi_l
            if cfg.pa:
                pa_l = pairwise_affinity_loss(preds_s[2], feat_t, cfg.pool_scale)
                metrics["pa_loss"] = pa_l
                loss = loss + cfg.lambda_pa * pa_l
            d_mut = None
            if cfg.ho:
                (d_out, _, _), d_mut = discriminator.apply(
                    {"params": state.d_params, "batch_stats": state.d_stats,
                     "spectral": state.d_spectral},
                    preds_s[0], train=True,
                    mutable=["batch_stats", "spectral"],
                )
                adv_g = adv_loss_for_g(d_out, cfg.adv_loss_type)
                metrics["adv_g_loss"] = adv_g
                loss = loss + cfg.lambda_d * adv_g
            return loss, (metrics, preds_s[0], s_mut, d_mut)

        with jax.named_scope("student_loss_and_grad"):
            (g_loss, (metrics, logits_s, s_mut, d_mut)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.student_params)
        metrics["g_loss"] = g_loss

        g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt, state.student_params)
        new_s_params = optax.apply_updates(state.student_params, g_updates)
        new_s_stats = s_mut["batch_stats"]

        if cfg.ho:
            d_stats = jax.lax.stop_gradient(d_mut["batch_stats"])
            d_spectral = jax.lax.stop_gradient(d_mut["spectral"])
            logits_s_sg = jax.lax.stop_gradient(logits_s)

            # --- D loss and update (reference discriminator_backward).
            def d_loss_fn(d_params):
                v1 = {"params": d_params, "batch_stats": d_stats, "spectral": d_spectral}
                (out_t, _, _), m2 = discriminator.apply(
                    v1, logits_t, train=True, mutable=["batch_stats", "spectral"]
                )
                v2 = {"params": d_params, **jax.lax.stop_gradient(m2)}
                (out_s, _, _), m3 = discriminator.apply(
                    v2, logits_s_sg, train=True, mutable=["batch_stats", "spectral"]
                )
                d_loss = cfg.lambda_d * adv_loss_for_d(out_s, out_t, cfg.adv_loss_type)
                m_last = m3
                if cfg.adv_loss_type == "wgan-gp":
                    v3 = {"params": d_params, **jax.lax.stop_gradient(m3)}
                    n = logits_t.shape[0]
                    alpha = jax.random.uniform(gp_rng, (n, 1, 1, 1), jnp.float32)
                    interp = alpha * logits_t + (1.0 - alpha) * logits_s_sg

                    def d_apply_for_gp(x):
                        (out, _, _), mut = discriminator.apply(
                            v3, x, train=True, mutable=["batch_stats", "spectral"]
                        )
                        return jnp.sum(out.astype(jnp.float32)), mut

                    _, gp_vjp, m4 = jax.vjp(d_apply_for_gp, interp, has_aux=True)
                    (grad_x,) = gp_vjp(jnp.float32(1.0))
                    grad_x = grad_x.reshape(n, -1)
                    grad_norm = jnp.sqrt(jnp.sum(jnp.square(grad_x), axis=1))
                    gp = cfg.lambda_gp * jnp.mean(jnp.square(grad_norm - 1.0))
                    d_loss = d_loss + cfg.lambda_d * gp
                    m_last = m4
                return d_loss, jax.lax.stop_gradient(m_last)

            (d_loss, d_mut_final), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.d_params
            )
            metrics["d_loss"] = d_loss
            d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
            new_d_params = optax.apply_updates(state.d_params, d_updates)
            new_d_stats = d_mut_final["batch_stats"]
            new_d_spectral = d_mut_final["spectral"]
        else:
            metrics["d_loss"] = jnp.float32(0.0)
            new_d_params, new_d_opt = state.d_params, state.d_opt
            new_d_stats, new_d_spectral = state.d_stats, state.d_spectral

        new_state = state.replace(
            step=state.step + 1,
            student_params=new_s_params,
            student_stats=new_s_stats,
            d_params=new_d_params,
            d_stats=new_d_stats,
            d_spectral=new_d_spectral,
            g_opt=new_g_opt,
            d_opt=new_d_opt,
        )
        return new_state, metrics

    return train_step


def make_train_loop(step_fn: Callable, unroll: int = 1) -> Callable:
    """Device-side multi-step loop: `lax.scan` of `step_fn` over a stacked
    leading microbatch axis.

    One dispatch runs `unroll` optimizer steps back-to-back on the device —
    the host/runtime per-step launch overhead (measured ~7 ms/step through
    the axon relay; real pods hide input with infeed the same way) is paid
    once per chunk instead of once per step. Semantics are identical to
    calling `step_fn` sequentially: the per-step RNG folds `state.rng` with
    `state.step`, the optax schedule count advances inside the carried
    optimizer state, and spectral u/v thread through the carry.

    Args:
      step_fn: the function from `make_train_step` (NOT yet jitted).
      unroll: number of steps per dispatch (static; shapes must match).

    Returns loop(state, images_k, labels_k, valid_k=None) -> (state,
    stacked_metrics) where images_k/labels_k carry a leading (unroll,) axis
    and every metric in stacked_metrics has shape (unroll,). Jit with
    donate_argnums=(0,).

    `valid_k` (optional (unroll,) bool) masks trailing padded steps: a
    masked iteration leaves the carried state untouched and returns zeroed
    metrics, via a real `lax.cond` branch (the skipped step costs only the
    predicate, not a per-leaf select). This lets a final partial chunk of
    `num_steps % unroll` steps reuse the ONE compiled loop program instead
    of triggering a second multi-minute compile of a per-step program at the
    end of a long run.
    """

    def train_loop(state, images_k, labels_k, valid_k=None):
        def run(st, images, labels):
            return step_fn(st, images, labels)

        def body(st, xs):
            if valid_k is None:
                return run(st, xs[0], xs[1])
            images, labels, valid = xs

            def skip(s):
                out = jax.eval_shape(run, s, images, labels)
                zeros = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype),
                                     out[1])
                return s, zeros

            return jax.lax.cond(valid, lambda s: run(s, images, labels),
                                skip, st)

        xs = ((images_k, labels_k) if valid_k is None
              else (images_k, labels_k, valid_k))
        return jax.lax.scan(body, state, xs, length=unroll)

    return train_loop
