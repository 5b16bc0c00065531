"""End-to-end integration: real model classes (shallow) through train → eval
→ checkpoint → resume, plus the multichip dry run the driver exercises."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structure_knowledge_distillation_tpu.config import TrainConfig
from structure_knowledge_distillation_tpu.models import Discriminator, ResPSPNet
from structure_knowledge_distillation_tpu.training import (
    checkpoint as ckpt,
    create_train_state,
    make_sgd,
    make_train_step,
)
from structure_knowledge_distillation_tpu.training.evaluate import evaluate_main


def _setup(num_steps=50):
    cfg = TrainConfig(
        classes_num=19, batch_size=2, input_size=(256, 256), imsize_for_adv=33,
        num_steps=num_steps, adv_conv_dim=16,
    )
    teacher = ResPSPNet(block="bottleneck", layers=(1, 1, 1, 1), num_classes=19)
    student = ResPSPNet(block="basic", layers=(1, 1, 1, 1), num_classes=19)
    disc = Discriminator(preprocess_mode=1, image_size=33, conv_dim=16)
    key = jax.random.PRNGKey(0)
    images = jax.random.normal(key, (2, 256, 256, 3), jnp.float32)
    labels = jax.random.randint(key, (2, 256, 256), 0, 19)
    t_vars = teacher.init(key, images[:1], train=False)
    s_vars = student.init(key, images[:1], train=False)
    d_vars = disc.init(key, jnp.zeros((1, 33, 33, 19)), train=False)
    g_tx = make_sgd(cfg.lr_g, cfg.num_steps, cfg.power, cfg.momentum, cfg.weight_decay)
    d_tx = make_sgd(cfg.lr_d, cfg.num_steps, cfg.power, cfg.momentum, cfg.weight_decay)
    state = create_train_state(key, t_vars, s_vars, d_vars, g_tx, d_tx)
    step = jax.jit(make_train_step(cfg, teacher, student, disc, g_tx, d_tx))
    return cfg, teacher, student, disc, state, step, images, labels


@pytest.mark.slow
def test_train_eval_checkpoint_resume(tmp_path):
    cfg, teacher, student, disc, state, step, images, labels = _setup()

    # --- two train steps with the real architectures (65x65-rule at 256² -> 33)
    state, metrics = step(state, images, labels)
    state, metrics = step(state, images, labels)
    assert int(state.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

    # --- eval path: whole-image predictor + confusion/mIoU on tiny val set
    variables = {"params": state.student_params, "batch_stats": state.student_stats}
    val = [(np.asarray(images[:1]), np.asarray(labels[:1]),
            np.array([[256, 256, 3]]), ["synthetic_0"])]
    mean_iu, iu_array = evaluate_main(
        student, variables, val, cfg.classes_num, out_size=(256, 256),
        eval_type="val", whole=True,
    )
    assert 0.0 <= mean_iu <= 1.0
    assert iu_array.shape == (19,)

    # --- checkpoint + resume: restored state continues identically
    path = ckpt.save_state(str(tmp_path / "state"), state, step=2, mean_iu=mean_iu)
    restored = ckpt.restore_state(path, state)
    s1, m1 = step(state, images, labels)
    s2, m2 = step(restored, images, labels)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-6, err_msg=k)


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out_shape = jax.eval_shape(jax.jit(fn), *args)
    assert out_shape.shape == (1, 65, 65, 19)
