"""Holistic (Ho) adversarial losses: G term, D term, WGAN gradient penalty.

Semantics of reference utils/criterion.py:92-166:
  * G loss: −E[D(S)] for both 'wgan-gp' and 'hinge' (CriterionAdvForG).
  * D loss: wgan-gp: E[D(S)] − E[D(T)]; hinge: E[relu(1−D(T))] + E[relu(1+D(S))]
    (CriterionAdv).
  * Gradient penalty (CriterionAdditionalGP): per-sample α-interpolation
    between teacher ("real") and student ("fake") score maps, penalty
    λ_gp · E[(‖∇_x D(x̂)‖₂ − 1)²]. The reference's
    autograd.grad(create_graph=True) double-backward is a plain nested
    `jax.grad` here, and the whole thing compiles into the jitted D step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["adv_loss_for_g", "adv_loss_for_d", "gradient_penalty"]


def adv_loss_for_g(d_out_fake: jnp.ndarray, adv_type: str = "wgan-gp") -> jnp.ndarray:
    if adv_type not in ("wgan-gp", "hinge"):
        raise ValueError("adv_type should be wgan-gp or hinge")
    return -jnp.mean(d_out_fake.astype(jnp.float32))


def adv_loss_for_d(
    d_out_fake: jnp.ndarray, d_out_real: jnp.ndarray, adv_type: str = "wgan-gp"
) -> jnp.ndarray:
    fake = d_out_fake.astype(jnp.float32)
    real = d_out_real.astype(jnp.float32)
    if adv_type == "wgan-gp":
        return jnp.mean(fake) - jnp.mean(real)
    if adv_type == "hinge":
        return jnp.mean(jax.nn.relu(1.0 - real)) + jnp.mean(jax.nn.relu(1.0 + fake))
    raise ValueError("adv_type should be wgan-gp or hinge")


def gradient_penalty(
    d_score_fn: Callable[[jnp.ndarray], jnp.ndarray],
    real: jnp.ndarray,
    fake: jnp.ndarray,
    rng: jax.Array,
    lambda_gp: float = 10.0,
) -> jnp.ndarray:
    """WGAN-GP on α-interpolated inputs.

    d_score_fn maps a (N,H,W,C) batch to per-sample scores (any shape with
    leading N). Interpolation uses one α per sample (reference
    criterion.py:104-105). Differentiating sum(D(x̂)) wrt x̂ matches the
    reference's grad_outputs=ones exactly (including any cross-sample
    coupling through the discriminator's preprocess batch-norm).
    """
    n = real.shape[0]
    alpha = jax.random.uniform(rng, (n, 1, 1, 1), dtype=jnp.float32)
    real = jax.lax.stop_gradient(real.astype(jnp.float32))
    fake = jax.lax.stop_gradient(fake.astype(jnp.float32))
    interp = alpha * real + (1.0 - alpha) * fake

    grad = jax.grad(lambda x: jnp.sum(d_score_fn(x).astype(jnp.float32)))(interp)
    grad = grad.reshape(n, -1)
    grad_norm = jnp.sqrt(jnp.sum(jnp.square(grad), axis=1))
    return lambda_gp * jnp.mean(jnp.square(grad_norm - 1.0))
