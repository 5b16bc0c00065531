"""Model-level tests: the 7-tuple feature contract, the 65×65 geometry,
the discriminator pipeline, and spectral-norm parity vs. torch semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from structure_knowledge_distillation_tpu.models import (
    Discriminator,
    ResPSPNet,
    student_model,
)


def test_student_feature_contract_shapes():
    """512² is too slow on CPU; 128² exercises the same stride arithmetic:
    128 -> stem conv /2 -> 64 -> ceil pool -> 33 -> layer2 /2 -> 17."""
    model = student_model(num_classes=19)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    logits, x_dsn, feat_psp, x4, x3, x2, x1 = outs
    assert logits.shape == (1, 17, 17, 19)
    assert x_dsn.shape == (1, 17, 17, 19)
    assert feat_psp.shape == (1, 17, 17, 128)
    assert x4.shape == (1, 17, 17, 512)
    assert x3.shape == (1, 17, 17, 256)
    assert x2.shape == (1, 17, 17, 128)
    assert x1.shape == (1, 33, 33, 64)
    # pairwise-loss indexing contract: feat_after_psp == index 2 == -5
    assert outs[-5] is outs[2]


def test_teacher_channel_widths():
    model = ResPSPNet(block="bottleneck", layers=(1, 1, 1, 1), num_classes=19)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, x_dsn, feat_psp, x4, x3, x2, x1 = model.apply(variables, x, train=False)
    assert feat_psp.shape[-1] == 512
    assert x4.shape[-1] == 2048
    assert x3.shape[-1] == 1024
    assert x1.shape[-1] == 256


def test_param_count_matches_torch_reference_scale():
    """Student ResNet18-PSP should be ~13M params (reference logs ~13.07M)."""
    model = student_model(num_classes=19)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 12.5e6 < n < 14.0e6, n


def test_discriminator_geometry_65():
    """65×65 19-ch input -> 32 -> 16 -> 8 (attn) -> 4 (attn) -> 1×1 score."""
    d = Discriminator(preprocess_mode=1, image_size=65)
    x = jnp.zeros((2, 65, 65, 19), jnp.float32)
    variables = d.init(jax.random.PRNGKey(0), x, train=False)
    out, p1, p2 = d.apply(
        variables, x, train=True, mutable=["batch_stats", "spectral"]
    )[0]
    assert out.shape == (2, 1, 1, 1)
    assert p1.shape == (2, 64, 64)    # 8x8 positions
    assert p2.shape == (2, 16, 16)    # 4x4 positions


def test_spectral_norm_matches_torch():
    """One power iteration + sigma normalization == the reference wrapper."""
    from structure_knowledge_distillation_tpu.ops.spectral import SNConv

    rng = np.random.RandomState(0)
    w_oihw = rng.randn(8, 4, 4, 4).astype(np.float32)  # (O, I, kh, kw)
    b = rng.randn(8).astype(np.float32)
    u0 = rng.randn(8).astype(np.float32)
    v0 = rng.randn(4 * 4 * 4).astype(np.float32)
    u0 /= np.linalg.norm(u0)
    v0 /= np.linalg.norm(v0)
    x = rng.randn(2, 9, 9, 4).astype(np.float32)

    # torch oracle: reference spectral.py semantics
    w_mat = torch.from_numpy(w_oihw.reshape(8, -1))
    u = torch.from_numpy(u0.copy())
    v = torch.from_numpy(v0.copy())
    v = torch.nn.functional.normalize(w_mat.t() @ u, dim=0, eps=1e-12)
    u = torch.nn.functional.normalize(w_mat @ v, dim=0, eps=1e-12)
    sigma = u @ (w_mat @ v)
    w_sn = torch.from_numpy(w_oihw) / sigma
    y_t = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), w_sn, torch.from_numpy(b),
        stride=2, padding=1,
    )

    mod = SNConv(features=8)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), update_stats=False)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))  # OIHW -> HWIO
    variables = {
        "params": {"weight": jnp.asarray(w_hwio), "bias": jnp.asarray(b)},
        "spectral": {"u": jnp.asarray(u0), "v": jnp.asarray(v0)},
    }
    y, new_state = mod.apply(
        variables, jnp.asarray(x), update_stats=True, mutable=["spectral"]
    )
    np.testing.assert_allclose(
        np.asarray(y), y_t.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(new_state["spectral"]["u"]), u.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["spectral"]["v"]), v.numpy(), rtol=1e-5, atol=1e-6)


def test_spectral_norm_state_updates_only_when_training():
    from structure_knowledge_distillation_tpu.ops.spectral import SNConv

    mod = SNConv(features=8)
    x = jnp.ones((1, 8, 8, 4))
    variables = mod.init(jax.random.PRNGKey(0), x, update_stats=False)
    _, state = mod.apply(variables, x, update_stats=False, mutable=["spectral"])
    np.testing.assert_array_equal(
        np.asarray(state["spectral"]["u"]), np.asarray(variables["spectral"]["u"])
    )
    _, state2 = mod.apply(variables, x, update_stats=True, mutable=["spectral"])
    assert not np.allclose(
        np.asarray(state2["spectral"]["u"]), np.asarray(variables["spectral"]["u"])
    )


def test_dropout_active_only_in_train():
    model = student_model(num_classes=5)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out_eval_1 = model.apply(variables, x, train=False)[0]
    out_eval_2 = model.apply(variables, x, train=False)[0]
    np.testing.assert_array_equal(np.asarray(out_eval_1), np.asarray(out_eval_2))
    out_train = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )[0][0]
    assert out_train.shape == out_eval_1.shape


def test_espnet_c_contract_and_stride():
    from structure_knowledge_distillation_tpu.models import ESPNetC

    model = ESPNetC(num_classes=11, p=1, q=2)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    logits, aux, feat = outs[0], outs[1], outs[2]
    assert logits.shape == (1, 12, 12, 11)     # stride 8
    assert feat.shape == (1, 12, 12, 256)      # level-3 concat width
    assert aux.shape[1] == 24                  # stride-4 aux head
    assert outs[-5] is outs[2]


def test_abn_extra_blocks():
    from structure_knowledge_distillation_tpu.models import (
        DenseModule, GlobalAvgPool2d, IdentityResidualBlock,
    )

    x = jnp.ones((2, 16, 16, 8))
    assert GlobalAvgPool2d().apply({}, x).shape == (2, 8)

    dense = DenseModule(growth=4, layers=3)
    v = dense.init(jax.random.PRNGKey(0), x, train=False)
    y = dense.apply(v, x, train=False)
    assert y.shape == (2, 16, 16, 8 + 4 * 3)

    for channels, stride in (((8, 8), 1), ((4, 4, 16), 2)):
        blk = IdentityResidualBlock(channels=channels, stride=stride)
        v = blk.init(jax.random.PRNGKey(0), x, train=False)
        y = blk.apply(v, x, train=False)
        assert y.shape == (2, 16 // stride, 16 // stride, channels[-1])


def test_param_count_util():
    from structure_knowledge_distillation_tpu.utils import count_params

    assert count_params({"a": jnp.ones((3, 4)), "b": {"c": jnp.ones((5,))}}) == 17


def test_fold_bn_matches_unfolded_teacher():
    """fold_bn=True + fold_bn_variables == the eval-mode ABN teacher
    (frozen-teacher inference optimization; BN semantics from
    reference libs/src/bn.cu:140-165 incl. gamma=|w|+eps)."""
    import numpy as np

    from structure_knowledge_distillation_tpu.models import (
        ResPSPNet, fold_bn_variables,
    )

    model = ResPSPNet(block="bottleneck", layers=(1, 1, 1, 1), num_classes=7)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # randomize params + stats so the fold is actually exercised
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.1),
        variables["params"])
    stats = jax.tree.map(
        lambda a: jnp.asarray((rng.rand(*a.shape) + 0.5).astype(np.float32)),
        variables["batch_stats"])
    variables = {"params": params, "batch_stats": stats}

    ref = model.apply(variables, x, train=False)
    folded_model = ResPSPNet(block="bottleneck", layers=(1, 1, 1, 1),
                             num_classes=7, fold_bn=True)
    folded_vars = fold_bn_variables(variables)
    # the folded tree matches the folded model's own init structure
    init_shape = jax.eval_shape(
        lambda: folded_model.init(jax.random.PRNGKey(0), x, train=False))
    assert jax.tree_util.tree_structure(init_shape["params"]) == \
        jax.tree_util.tree_structure(folded_vars["params"])
    got = folded_model.apply(folded_vars, x, train=False)
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=f"output {i}")


def test_psp_factored_bottleneck_matches_dense():
    """_PSPBottleneckConv (9-tap low-res decomposition, the TPU fast path)
    == concat + dense 3×3 conv, values AND input grads."""
    import numpy as np

    from structure_knowledge_distillation_tpu.models import ResPSPNet

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    fast = ResPSPNet(block="basic", layers=(1, 1, 1, 1), num_classes=6)
    dense = ResPSPNet(block="basic", layers=(1, 1, 1, 1), num_classes=6,
                      dense_psp_bottleneck=True)
    variables = fast.init(jax.random.PRNGKey(2), x, train=False)
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.1),
        variables["params"])
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    out_f = fast.apply(variables, x, train=False)
    out_d = dense.apply(variables, x, train=False)
    for i, (a, b) in enumerate(zip(out_f, out_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"out {i}")

    def loss(m, v):
        outs = m.apply(v, x, train=False)
        return jnp.sum(outs[2].astype(jnp.float32) ** 2)

    g_f = jax.grad(lambda v: loss(fast, v))(variables)["params"]
    g_d = jax.grad(lambda v: loss(dense, v))(variables)["params"]
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_f), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g_d), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4, err_msg=str(pa))


def test_stem_s2d_conv1_matches_plain_conv():
    """Space-to-depth folded stem conv1 (`_StemS2DConv1`) == nn.Conv 3×3/s2
    on the SAME parameter tree — values, kernel grad, and input grad. The
    fold re-lays the canonical (3,3,3,F) kernel in-forward, so checkpoints
    are layout-unchanged. Reference stem: pspnet_combine.py:121-127."""
    from structure_knowledge_distillation_tpu.models.resnet_pspnet import (
        _StemS2DConv1, _conv,
    )

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 16, 20, 3).astype(np.float32))
    plain, s2d = _conv(8, 3, 2), _StemS2DConv1(8)
    v = plain.init(jax.random.PRNGKey(0), x)
    y0, y1 = plain.apply(v, x), s2d.apply(v, x)
    assert y1.shape == y0.shape == (2, 8, 10, 8)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)

    tgt = jnp.asarray(rng.randn(*y0.shape).astype(np.float32))

    def loss(m):
        return lambda v, x: jnp.sum((m.apply(v, x) - tgt) ** 2)

    g0 = jax.grad(loss(plain), argnums=(0, 1))(v, x)
    g1 = jax.grad(loss(s2d), argnums=(0, 1))(v, x)
    np.testing.assert_allclose(np.asarray(g0[0]["params"]["kernel"]),
                               np.asarray(g1[0]["params"]["kernel"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]),
                               rtol=1e-4, atol=1e-5)


def test_stem_s2d_model_forward_and_odd_fallback():
    """ResPSPNet(stem_s2d=True) reproduces the plain model on the same
    variables at even geometry, and falls back to the plain conv (same
    program, same outputs) at odd H/W — VOC's 505² must keep working."""
    rng = np.random.RandomState(12)
    plain = ResPSPNet(block="basic", layers=(1, 1, 1, 1), num_classes=6)
    s2d = ResPSPNet(block="basic", layers=(1, 1, 1, 1), num_classes=6,
                    stem_s2d=True)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = plain.init(jax.random.PRNGKey(3), x, train=False)
    out_p = plain.apply(variables, x, train=False)
    out_s = s2d.apply(variables, x, train=False)
    for i, (a, b) in enumerate(zip(out_p, out_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"out {i}")
    # odd geometry: both run the identical plain-conv path
    x_odd = jnp.asarray(rng.randn(1, 65, 65, 3).astype(np.float32))
    out_po = plain.apply(variables, x_odd, train=False)
    out_so = s2d.apply(variables, x_odd, train=False)
    np.testing.assert_allclose(np.asarray(out_po[0]), np.asarray(out_so[0]),
                               rtol=1e-6, atol=1e-6)


def test_stem_s2d_spatial_sharding_invariance():
    """The s2d stem's H→(H/2, 2) reshape crosses the `spatial` mesh axis
    when training runs sp-sharded (batch_sharding shards image height):
    XLA must reshard/halo it without changing numerics. Forward AND a
    param-grad under a (data=2, spatial=2)-sharded input == unsharded."""
    from structure_knowledge_distillation_tpu.parallel import (
        batch_sharding, make_mesh,
    )

    rng = np.random.RandomState(13)
    model = ResPSPNet(block="basic", layers=(1, 1, 1, 1), num_classes=6,
                      stem_s2d=True)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(4), x, train=False)

    def head_loss(v, xx):
        return jnp.sum(model.apply(v, xx, train=False)[0] ** 2)

    fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False)[0])
    ref_y = fwd(variables, x)
    ref_g = jax.jit(jax.grad(head_loss))(variables, x)

    mesh = make_mesh(num_data=2, num_model=1, num_spatial=2)
    xs = jax.device_put(x, batch_sharding(mesh))
    sh_y = fwd(variables, xs)
    sh_g = jax.jit(jax.grad(head_loss))(variables, xs)
    np.testing.assert_allclose(np.asarray(ref_y), np.asarray(sh_y),
                               rtol=1e-5, atol=1e-5)
    stem_key = [k for k in ref_g["params"] if "conv1" in k.lower()] or \
        list(ref_g["params"])[:1]
    for k in stem_key:
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g["params"][k]),
            jax.tree_util.tree_leaves_with_path(sh_g["params"][k]),
        ):
            # sharded grad accumulation reorders f32 sums (measured max
            # rel drift ~4e-4 on the stem kernel) — same envelope as the
            # sharded train-step invariance tests
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-4,
                                       err_msg=f"{k}{pa}")


def test_stem_s2d_cli_config_reaches_trainer_models():
    """The s2d stem flag flows TrainConfig.from_args → KDTrainer → BOTH
    ResPSPNet modules (teacher and student). It defaults ON (the measured
    +0.6% full-recipe win, ROADMAP round-4 stem notes; exact parity, same
    checkpoints) and `--stem-s2d false` opts out."""
    from structure_knowledge_distillation_tpu.config import TrainConfig
    from structure_knowledge_distillation_tpu.training.trainer import KDTrainer

    argv = ["--stem-s2d", "true", "--input-size", "64,64", "--batch-size", "1",
            "--num-steps", "1", "--teacher-layers", "1,1,1,1",
            "--imsize-for-adv", "33", "--adv-conv-dim", "8", "--ho", "false",
            "--compute-dtype", "float32", "--log-path", ""]
    cfg = TrainConfig.from_args(argv)
    assert cfg.stem_s2d is True
    assert TrainConfig.from_args(argv[2:]).stem_s2d is True  # default ON
    off = TrainConfig.from_args(["--stem-s2d", "false"] + argv[2:])
    assert off.stem_s2d is False
    trainer = KDTrainer(cfg)
    assert trainer.teacher.stem_s2d and trainer.student.stem_s2d
    trainer_off = KDTrainer(off)
    assert not (trainer_off.teacher.stem_s2d or trainer_off.student.stem_s2d)


def test_width_mult_scales_channels_and_trains():
    """width_mult scales stem/plan/DSN/PSP widths uniformly (heads stay at
    num_classes); 1.0 is the reference geometry (asserted by the width tests
    above, which all run at the default). Used by dryrun_multichip to run
    the full sharded program at a fraction of the simulated-device FLOPs."""
    model = ResPSPNet(block="basic", layers=(1, 1, 1, 1), num_classes=19,
                      width_mult=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, x_dsn, feat_psp, x4, x3, x2, x1 = model.apply(
        variables, x, train=False)
    assert logits.shape[-1] == 19 and x_dsn.shape[-1] == 19  # heads unscaled
    assert feat_psp.shape[-1] == 64   # 128 * 0.5
    assert x4.shape[-1] == 256        # 512 * 0.5
    assert x3.shape[-1] == 128
    assert x1.shape[-1] == 32

    # and it trains: one CE grad step, finite and non-zero
    def loss(params):
        out = model.apply({**variables, "params": params}, x, train=False)
        return jnp.mean(out[0].astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(variables["params"])
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert any(n > 0 for n in norms)
