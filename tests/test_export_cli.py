"""cli.export: checkpoint -> (folded) inference msgpack round trip."""

import json

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def test_export_cli_folds_and_roundtrips(tmp_path):
    from structure_knowledge_distillation_tpu.cli.export import main
    from structure_knowledge_distillation_tpu.models import ResPSPNet, student_model

    model = student_model(num_classes=19)
    dummy = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    # non-trivial batch_stats so folding actually has something to fold
    # (keep params at init scale — uniform offsets blow activations up
    # exponentially through the depth)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(lambda x: x * 1.3 + 0.1,
                                    variables["batch_stats"]),
    }

    src = tmp_path / "ckpt.msgpack"
    src.write_bytes(serialization.to_bytes(jax.device_get(variables)))

    out = main(["--checkpoint", str(src), "--output",
                str(tmp_path / "infer"), "--fold-bn", "--verify-size", "64"])
    meta = json.loads((tmp_path / "infer.json").read_text())
    assert meta["fold_bn"] and meta["fold_max_logit_diff"] < 1e-3

    # the folded artifact drives ResPSPNet(fold_bn=True) to the same logits
    folded_model = ResPSPNet(block="basic", layers=(2, 2, 2, 2),
                             num_classes=19, fold_bn=True)
    template = folded_model.init(jax.random.PRNGKey(1), dummy, train=False)
    restored = serialization.from_bytes(
        template, (tmp_path / "infer.msgpack").read_bytes())
    ref = model.apply(variables, dummy, train=False)[0]
    got = folded_model.apply(restored, dummy, train=False)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)
    assert out.endswith(".msgpack")


def test_export_cli_stablehlo_serving_roundtrip(tmp_path):
    """--stablehlo-output: the serialized artifact alone (no model code, no
    checkpoint) reproduces the raw-image → uint8 classmap serving path."""
    from jax import export as jexport

    from structure_knowledge_distillation_tpu.cli.export import main
    from structure_knowledge_distillation_tpu.models import student_model
    from structure_knowledge_distillation_tpu.ops.resize import (
        resize_bilinear_align_corners,
    )

    model = student_model(num_classes=19)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    src = tmp_path / "ckpt.msgpack"
    src.write_bytes(serialization.to_bytes(jax.device_get(variables)))

    shlo = tmp_path / "student_serve.shlo"
    main(["--checkpoint", str(src), "--output", str(tmp_path / "infer"),
          "--stablehlo-output", str(shlo), "--stablehlo-size", "64,64",
          "--stablehlo-mode", "classmap"])
    meta = json.loads((tmp_path / "infer.json").read_text())
    assert meta["stablehlo"]["input"] == [1, 64, 64, 3]

    # raw (not mean-subtracted) BGR-style image in the serving value range
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3),
                             jnp.float32, 0.0, 255.0)
    restored = jexport.deserialize(shlo.read_bytes())
    got = restored.call(img)
    assert got.shape == (1, 64, 64) and got.dtype == jnp.uint8

    mean = jnp.asarray((104.00698793, 116.66876762, 122.67891434), jnp.float32)
    logits = model.apply(variables, img - mean, train=False)[0]
    logits = resize_bilinear_align_corners(logits.astype(jnp.float32), (64, 64))
    want = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
    # the exported program is the SAME math compiled as one constant-folded
    # StableHLO module — fusion may differ by float ulps, so tolerate argmax
    # flips at exact class-logit near-ties rather than exact byte equality
    mismatch = float(np.mean(np.asarray(got) != np.asarray(want)))
    assert mismatch <= 1e-3, f"classmap mismatch rate {mismatch}"
