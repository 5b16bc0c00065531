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
