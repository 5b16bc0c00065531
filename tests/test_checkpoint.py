"""Checkpoint save/restore + torch import/export tests."""

import jax
import jax.numpy as jnp
import numpy as np

from structure_knowledge_distillation_tpu.models import ResPSPNet
from structure_knowledge_distillation_tpu.training import checkpoint as ckpt


def test_map_torch_key_schema():
    # names documented from reference pspnet_combine.py / utils.py:78-87
    assert ckpt.map_torch_key("conv1.weight") == ("params", ("conv1", "kernel"), True)
    assert ckpt.map_torch_key("bn1.running_mean") == ("batch_stats", ("bn1", "mean"), False)
    assert ckpt.map_torch_key("layer2.0.downsample.0.weight") == (
        "params", ("layer2_0", "downsample_conv", "kernel"), True)
    assert ckpt.map_torch_key("layer2.0.downsample.1.running_var") == (
        "batch_stats", ("layer2_0", "downsample_bn", "var"), False)
    assert ckpt.map_torch_key("layer4.22.bn3.weight") == (
        "params", ("layer4_22", "bn3", "weight"), False)
    assert ckpt.map_torch_key("pspmodule.stages.2.1.weight") == (
        "params", ("pspmodule", "stage2_conv", "kernel"), True)
    assert ckpt.map_torch_key("pspmodule.bottleneck.1.bias") == (
        "params", ("pspmodule", "bottleneck_bn", "bias"), False)
    assert ckpt.map_torch_key("head.weight") == ("params", ("head", "kernel"), True)
    assert ckpt.map_torch_key("dsn.0.bias") == ("params", ("dsn_conv1", "bias"), False)
    assert ckpt.map_torch_key("dsn.3.weight") == ("params", ("dsn_conv2", "kernel"), True)
    # released-teacher remap (reference utils/utils.py:78-87)
    assert ckpt.map_torch_key("head.0.bottleneck.0.weight") == (
        "params", ("pspmodule", "bottleneck_conv", "kernel"), True)
    assert ckpt.map_torch_key("head.1.weight") == ("params", ("head", "kernel"), True)
    # drops
    assert ckpt.map_torch_key("fc.weight") is None
    assert ckpt.map_torch_key("bn1.num_batches_tracked") is None
    # module. prefix strip
    assert ckpt.map_torch_key("module.conv1.weight") == ("params", ("conv1", "kernel"), True)


def _tiny_student_vars():
    model = ResPSPNet(block="basic", layers=(1, 1, 1, 1), num_classes=4)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return model, model.init(jax.random.PRNGKey(0), x, train=False)


def test_torch_export_import_roundtrip():
    model, variables = _tiny_student_vars()
    sd = ckpt.export_torch_respspnet(variables)
    assert "conv1.weight" in sd and sd["conv1.weight"].shape == (64, 3, 3, 3)
    assert "layer1.0.conv1.weight" in sd
    assert "pspmodule.stages.0.1.weight" in sd
    assert "dsn.1.running_var" in sd

    # zero out a target tree and re-import: must reproduce the original
    zeros = jax.tree.map(jnp.zeros_like, variables)
    restored = ckpt.import_torch_respspnet(sd, zeros)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(variables), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(restored), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(pa))


def test_import_skips_shape_mismatch():
    model, variables = _tiny_student_vars()
    sd = ckpt.export_torch_respspnet(variables)
    sd["conv1.weight"] = np.zeros((64, 3, 7, 7), np.float32)  # torchvision-style stem
    before = np.asarray(
        variables["params"]["conv1"]["kernel"]
    )
    restored = ckpt.import_torch_respspnet(sd, variables)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["conv1"]["kernel"]), before
    )


def test_save_restore_state_roundtrip(tmp_path):
    from structure_knowledge_distillation_tpu.training import (
        create_train_state, make_sgd,
    )

    model, variables = _tiny_student_vars()
    tx = make_sgd(0.01, 100, 0.9, 0.9, 5e-4)
    state = create_train_state(
        jax.random.PRNGKey(0), variables, variables,
        {"params": {"w": jnp.ones((3,))}}, tx, tx,
    )
    path = ckpt.save_state(str(tmp_path / "ck"), state, step=3, mean_iu=0.5)
    restored = ckpt.restore_state(path, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    meta = ckpt.load_meta(path)
    assert meta["step"] == 3 and abs(meta["mean_iu"] - 0.5) < 1e-9


def test_orbax_async_save_restore(tmp_path):
    from structure_knowledge_distillation_tpu.training import (
        create_train_state, make_sgd,
    )

    model, variables = _tiny_student_vars()
    tx = make_sgd(0.01, 100, 0.9, 0.9, 5e-4)
    state = create_train_state(
        jax.random.PRNGKey(0), variables, variables,
        {"params": {"w": jnp.ones((3,))}}, tx, tx, last_step=7,
    )
    ckpt.save_state_async(str(tmp_path / "orbax"), state, step=7)
    ckpt.wait_for_saves()
    restored, step = ckpt.restore_latest(str(tmp_path / "orbax"), state)
    assert step == 7
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_cityscapes_lists(tmp_path):
    import os

    from structure_knowledge_distillation_tpu.data.lists import make_cityscapes_lists

    for split, city in (("train", "aachen"), ("val", "munich"), ("test", "berlin")):
        os.makedirs(tmp_path / "leftImg8bit" / split / city, exist_ok=True)
        os.makedirs(tmp_path / "gtFine" / split / city, exist_ok=True)
        for i in range(2):
            (tmp_path / "leftImg8bit" / split / city /
             f"{city}_{i:06d}_leftImg8bit.png").touch()
            (tmp_path / "gtFine" / split / city /
             f"{city}_{i:06d}_gtFine_labelIds.png").touch()
    written = make_cityscapes_lists(str(tmp_path))
    assert set(written) == {"train", "val", "test"}
    train_lines = open(written["train"]).readlines()
    assert len(train_lines) == 2 and "\t" in train_lines[0]
    test_lines = open(written["test"]).readlines()
    assert len(test_lines) == 2 and "\t" not in test_lines[0]


def test_load_student_variables_from_state_and_raw(tmp_path):
    from structure_knowledge_distillation_tpu.training import (
        create_train_state, make_sgd,
    )

    model, variables = _tiny_student_vars()
    tx = make_sgd(0.01, 100, 0.9, 0.9, 5e-4)
    state = create_train_state(
        jax.random.PRNGKey(0), variables, variables,
        {"params": {"w": jnp.ones((3,))}}, tx, tx,
    )
    path = ckpt.save_state(str(tmp_path / "full"), state, step=1, mean_iu=0.1)
    template = jax.tree.map(jnp.zeros_like, variables)
    got = ckpt.load_student_variables(path, template)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # raw-variables file too
    from flax import serialization
    raw_path = tmp_path / "raw.msgpack"
    raw_path.write_bytes(serialization.to_bytes(jax.device_get(variables)))
    got2 = ckpt.load_student_variables(str(raw_path), template)
    for a, b in zip(jax.tree.leaves(got2), jax.tree.leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ------------------------------------------------------------- discriminator
def _tiny_disc_vars(conv_dim=8, imsize=65):
    from structure_knowledge_distillation_tpu.models import Discriminator

    model = Discriminator(preprocess_mode=1, image_size=imsize, conv_dim=conv_dim)
    x = jnp.zeros((1, imsize, imsize, 19), jnp.float32)
    return model, model.init(jax.random.PRNGKey(3), x, train=False)


def test_map_torch_discriminator_key_schema():
    # names documented from reference sagan_models.py:105-154 + spectral.py:44-63
    m = ckpt.map_torch_discriminator_key
    assert m("l1.0.module.weight_bar") == ("params", ("l1", "weight"), True)
    assert m("l1.0.module.weight_u") == ("spectral", ("l1", "u"), False)
    assert m("l4.0.module.weight_v") == ("spectral", ("l4", "v"), False)
    assert m("l2.0.module.bias") == ("params", ("l2", "bias"), False)
    assert m("last.0.weight") == ("params", ("last", "kernel"), True)
    assert m("last.0.bias") == ("params", ("last", "bias"), False)
    assert m("attn1.query_conv.weight") == (
        "params", ("attn1", "query_conv", "kernel"), True)
    assert m("attn2.gamma") == ("params", ("attn2", "gamma"), False)
    assert m("preprocess_additional.weight") == (
        "params", ("preprocess_bn", "weight"), False)
    assert m("preprocess_additional.running_mean") == (
        "batch_stats", ("preprocess_bn", "mean"), False)
    assert m("preprocess_additional.num_batches_tracked") is None
    # DataParallel prefix strip (reference utils/utils.py:139-143)
    assert m("module.l1.0.module.weight_bar") == ("params", ("l1", "weight"), True)


def test_discriminator_export_import_roundtrip():
    model, variables = _tiny_disc_vars()
    rng = np.random.RandomState(1)
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32)), variables)
    sd = ckpt.export_torch_discriminator(variables)
    # every torch key the reference emits is present
    for want in ("l1.0.module.weight_bar", "l1.0.module.weight_u",
                 "l4.0.module.bias", "last.0.weight", "attn1.value_conv.bias",
                 "attn2.gamma", "preprocess_additional.running_var"):
        assert want in sd, want
    zeros = jax.tree.map(jnp.zeros_like, variables)
    restored = ckpt.import_torch_discriminator(sd, zeros)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(variables), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(restored), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(pa))


def test_d_resume_wiring(tmp_path):
    """cli.train.load_initial_variables consumes D_resume/D_ckpt_path
    (reference load_D_model, utils/utils.py:130-151)."""
    import torch

    from structure_knowledge_distillation_tpu.cli.train import load_initial_variables
    from structure_knowledge_distillation_tpu.config import TrainConfig

    model, variables = _tiny_disc_vars(conv_dim=8)
    rng = np.random.RandomState(2)
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32)), variables)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in ckpt.export_torch_discriminator(variables).items()}
    d_dir = tmp_path / "D"
    d_dir.mkdir()
    torch.save({"state_dict": sd, "epoch": 1, "best_mean_IU": 0.5},
               str(d_dir / "model_best.pth.tar"))

    cfg = TrainConfig(data_set="synthetic", D_resume=True, D_ckpt_path=str(d_dir),
                      adv_conv_dim=8, imsize_for_adv=65)
    _, _, d_vars = load_initial_variables(cfg)
    assert d_vars is not None
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(variables), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(d_vars), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(pa))


def test_resume_schedule_offset():
    """A last_step resume continues the poly lr exactly where the unbroken
    run would be (reference utils/utils.py:112 + train_and_eval.py:21)."""
    import optax

    from structure_knowledge_distillation_tpu.training import (
        create_train_state, make_sgd, poly_schedule,
    )

    lr, steps, power, j = 0.1, 20, 0.9, 7
    tx = make_sgd(lr, steps, power, momentum=0.0, weight_decay=0.0)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}

    # unbroken: j updates, then observe the (j+1)-th delta
    opt = tx.init(params)
    for _ in range(j):
        _, opt = tx.update(grads, opt, params)
    upd, _ = tx.update(grads, opt, params)

    # resumed at last_step=j via create_train_state
    state = create_train_state(
        jax.random.PRNGKey(0), {"params": params}, {"params": params},
        {"params": params}, tx, tx, last_step=j)
    upd_resumed, _ = tx.update(grads, state.g_opt, params)

    expect = -float(poly_schedule(lr, steps, power)(j))
    np.testing.assert_allclose(np.asarray(upd["w"]), expect, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd_resumed["w"]),
                               np.asarray(upd["w"]), rtol=1e-6)


def _schedule_counts(opt_state):
    found = []

    def is_count(n):
        return hasattr(n, "_fields") and "count" in n._fields

    jax.tree.map(lambda n: found.append(int(n.count)) if is_count(n) else None,
                 opt_state, is_leaf=is_count)
    return found


def test_trainer_resume_from_named_snapshot(tmp_path):
    """KDTrainer.resume_from_snapshot: explicit torch/.msgpack snapshot restores
    step + best_mean_IU and offsets the lr schedule (reference
    utils/utils.py:108-127, train_and_eval.py:21)."""
    import torch

    from structure_knowledge_distillation_tpu.config import TrainConfig
    from structure_knowledge_distillation_tpu.training.trainer import KDTrainer

    cfg = TrainConfig(
        data_set="synthetic", teacher_layers=(1, 1, 1, 1),
        input_size=(256, 256), imsize_for_adv=33, adv_conv_dim=16,
        batch_size=1, num_steps=50,
    )
    trainer = KDTrainer(cfg)

    # --- torch .pth.tar with step/best_mean_IU meta
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          ckpt.export_torch_respspnet(
              {"params": trainer.state.student_params,
               "batch_stats": trainer.state.student_stats}).items()}
    path = str(tmp_path / "model_best.pth.tar")
    torch.save({"state_dict": sd, "step": 5, "best_mean_IU": 0.42}, path)
    got = trainer.resume_from_snapshot(path)
    assert got == 5 and trainer.start_step == 5
    assert int(trainer.state.step) == 5
    assert trainer.cfg.best_mean_IU == 0.42
    assert _schedule_counts(trainer.state.g_opt) == [5]
    assert _schedule_counts(trainer.state.d_opt) == [5]

    # --- native full-state msgpack
    p2 = ckpt.save_state(str(tmp_path / "snap"), trainer.state, step=9, mean_iu=0.6)
    trainer2 = KDTrainer(cfg)
    got2 = trainer2.resume_from_snapshot(p2)
    assert got2 == 9 and trainer2.start_step == 9
    assert _schedule_counts(trainer2.state.g_opt) == [5]  # restored verbatim


def test_slim_cadence_snapshot_and_weights_only_resume(tmp_path):
    """save_checkpoint's CS_scenes_* snapshot is a bare student-variables
    msgpack (reference kd_model.py:192 saves the student state_dict only —
    no teacher/optimizer, ~5x fewer bytes); load_student_variables reads it
    and resume_from_snapshot does a weights-only resume with the schedule
    offset."""
    import jax
    import jax.numpy as jnp

    from structure_knowledge_distillation_tpu.config import TrainConfig
    from structure_knowledge_distillation_tpu.training.trainer import KDTrainer

    cfg = TrainConfig(
        classes_num=19, batch_size=2, input_size=(128, 128), num_steps=10,
        teacher_layers=(1, 1, 1, 1), ho=False, compute_dtype="float32",
        snapshot_dir=str(tmp_path / "snap"),
        S_ckpt_path=str(tmp_path / "snap"), log_path="",
    )
    trainer = KDTrainer(cfg)
    trainer.state = trainer.state.replace(step=jnp.asarray(3, jnp.int32))
    path = trainer.save_checkpoint(3, 0.5, is_best=True, state_step=4)

    # slim: much smaller than the full model_best file
    import os

    slim = os.path.getsize(path + ".msgpack")
    full = os.path.getsize(os.path.join(cfg.snapshot_dir, "model_best.msgpack"))
    assert slim < full / 2, (slim, full)

    # loadable as plain student variables
    variables = {"params": trainer.state.student_params,
                 "batch_stats": trainer.state.student_stats}
    loaded = ckpt.load_student_variables(path, variables)
    for a, b in zip(jax.tree.leaves(loaded["params"]),
                    jax.tree.leaves(trainer.state.student_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # weights-only resume restores weights + step/schedule from metadata
    trainer2 = KDTrainer(cfg)
    step = trainer2.resume_from_snapshot(path)
    assert step == 4  # state_step (device-loop actual), not the cadence 3
    for a, b in zip(jax.tree.leaves(trainer2.state.student_params),
                    jax.tree.leaves(trainer.state.student_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(trainer2.state.step) == 4
