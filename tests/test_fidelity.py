"""Fidelity regression tests.

1. Golden step-0 loss values for fixed seeds (SURVEY.md §4's proposed
   golden-value regression) — catches silent numerics drift across rounds.
2. The discriminator's spectral u advances exactly FOUR power iterations per
   wgan-gp step (G-adv forward, D(T), D(S), D(interp)) and THREE per hinge
   step — the reference's per-step update count (SURVEY.md §7).
"""

import jax
import jax.numpy as jnp
import numpy as np

from structure_knowledge_distillation_tpu.models import Discriminator
from structure_knowledge_distillation_tpu.training import (
    create_train_state,
    make_sgd,
    make_train_step,
)
from tests.test_train_step import CLASSES, TinyNet, build, make_cfg


def test_step0_losses_golden():
    cfg = make_cfg(pi=True, pa=True, ho=True, adv_loss_type="wgan-gp")
    state, step_fn, images, labels = build(cfg)
    _, metrics = step_fn(state, images, labels)
    got = {k: float(v) for k, v in metrics.items()}
    # recorded 2026-08-16 (round 1), CPU f32, seeds build(rng=0)/PRNGKey(7)
    golden = {
        "adv_g_loss": 0.09428,
        "d_loss": 0.570392,
        "g_loss": 46.599312,
        "mc_loss": 2.894799,
        "pa_loss": 0.001629,
        "pi_loss": 4.369346,
    }
    for k, v in golden.items():
        np.testing.assert_allclose(got[k], v, rtol=2e-3, atol=1e-5, err_msg=k)


def _power_iter(w_mat, u, v, iters):
    for _ in range(iters):
        v = w_mat.T @ u
        v = v / (np.linalg.norm(v) + 1e-12)
        u = w_mat @ v
        u = u / (np.linalg.norm(u) + 1e-12)
    return u, v


def _u_updates_per_step(adv_type: str) -> int:
    cfg = make_cfg(adv_loss_type=adv_type)
    teacher = TinyNet(width=32)
    student = TinyNet(width=16)
    disc = Discriminator(preprocess_mode=1, image_size=33, conv_dim=16)
    key = jax.random.PRNGKey(0)
    images = jax.random.normal(key, (2, *cfg.input_size, 3), jnp.float32)
    labels = jax.random.randint(key, (2, *cfg.input_size), 0, CLASSES)
    t_vars = teacher.init(key, images, train=False)
    s_vars = student.init(key, images, train=False)
    d_vars = disc.init(key, jnp.zeros((2, 33, 33, CLASSES)), train=False)
    g_tx = make_sgd(cfg.lr_g, cfg.num_steps, cfg.power, cfg.momentum, cfg.weight_decay)
    d_tx = make_sgd(cfg.lr_d, cfg.num_steps, cfg.power, cfg.momentum, cfg.weight_decay)
    state = create_train_state(key, t_vars, s_vars, d_vars, g_tx, d_tx)
    step = jax.jit(make_train_step(cfg, teacher, student, disc, g_tx, d_tx))
    new_state, _ = step(state, images, labels)

    # l1's weight matrix in torch flattening; PI is input-independent, so the
    # number of per-step updates is recoverable by matching PI^k(u0)
    w = np.asarray(state.d_params["l1"]["weight"], np.float32)
    w_mat = np.transpose(w, (3, 2, 0, 1)).reshape(w.shape[3], -1)
    u0 = np.asarray(state.d_spectral["l1"]["u"], np.float32)
    v0 = np.asarray(state.d_spectral["l1"]["v"], np.float32)
    u_final = np.asarray(new_state.d_spectral["l1"]["u"], np.float32)
    for k in range(1, 7):
        u_k, _ = _power_iter(w_mat, u0.copy(), v0.copy(), k)
        if np.allclose(u_k, u_final, rtol=1e-4, atol=1e-5):
            return k
    return -1


def test_spectral_updates_per_step_wgan_gp():
    assert _u_updates_per_step("wgan-gp") == 4


def test_spectral_updates_per_step_hinge():
    assert _u_updates_per_step("hinge") == 3
