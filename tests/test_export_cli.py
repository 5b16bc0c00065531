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
