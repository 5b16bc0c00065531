"""End-to-end forward parity: our flax ResPSPNet vs a torch functional oracle
driven by the exported state_dict.

This is the gate for checkpoint-import correctness (SURVEY.md §7 hard part
#1): if our export → torch-forward equals our flax forward, then importing a
real released torch checkpoint reproduces its numerics. The oracle is a pure
function over a state_dict (eval mode), covering: 3-conv stem, ceil-mode
stem pool, dilated basic/bottleneck blocks with downsample, PSP pyramid with
torch adaptive pooling + align-corners upsampling, ABN convention
(gamma = |w| + eps, leaky_relu 0.01 inside PSP/DSN), DSN head, and the
classifier.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from structure_knowledge_distillation_tpu.models import ResPSPNet
from structure_knowledge_distillation_tpu.training import checkpoint as ckpt

pytestmark = pytest.mark.slow  # full ResPSPNet/SAGAN forwards vs torch (compile-heavy)

EPS = 1e-5


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key]))


def _conv(sd, x, key, stride=1, dilation=1, bias=False):
    w = _t(sd, f"{key}.weight")
    b = _t(sd, f"{key}.bias") if bias else None
    pad = dilation * (w.shape[-1] - 1) // 2
    return F.conv2d(x, w, b, stride=stride, padding=pad, dilation=dilation)


def _abn(sd, x, key, activation="none"):
    # eval mode: running stats; gamma = |weight| + eps (ABN convention)
    gamma = _t(sd, f"{key}.weight").abs() + EPS
    beta = _t(sd, f"{key}.bias")
    mean = _t(sd, f"{key}.running_mean")
    var = _t(sd, f"{key}.running_var")
    y = (x - mean[None, :, None, None]) / torch.sqrt(var[None, :, None, None] + EPS)
    y = y * gamma[None, :, None, None] + beta[None, :, None, None]
    if activation == "leaky_relu":
        y = F.leaky_relu(y, 0.01)
    return y


def _block(sd, x, prefix, bottleneck, stride=1, dilation=1, has_down=False):
    if bottleneck:
        h = F.relu(_abn(sd, _conv(sd, x, f"{prefix}.conv1"), f"{prefix}.bn1"))
        h = F.relu(_abn(sd, _conv(sd, h, f"{prefix}.conv2", stride, dilation),
                        f"{prefix}.bn2"))
        h = _abn(sd, _conv(sd, h, f"{prefix}.conv3"), f"{prefix}.bn3")
    else:
        h = F.relu(_abn(sd, _conv(sd, x, f"{prefix}.conv1", stride, dilation),
                        f"{prefix}.bn1"))
        h = _abn(sd, _conv(sd, h, f"{prefix}.conv2", 1, dilation), f"{prefix}.bn2")
    res = x
    if has_down:
        res = _abn(sd, _conv(sd, x, f"{prefix}.downsample.0", stride),
                   f"{prefix}.downsample.1")
    return F.relu(h + res)


def torch_oracle_forward(sd, x_nchw, block, layers, num_classes):
    x = F.relu(_abn(sd, _conv(sd, x_nchw, "conv1", stride=2), "bn1"))
    x = F.relu(_abn(sd, _conv(sd, x, "conv2"), "bn2"))
    x = F.relu(_abn(sd, _conv(sd, x, "conv3"), "bn3"))
    x = F.max_pool2d(x, 3, 2, 1, ceil_mode=True)

    bottleneck = block == "bottleneck"
    expansion = 4 if bottleneck else 1
    inplanes = 128
    plan = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
    feats = []
    for li, ((planes, stride, dilation), blocks) in enumerate(zip(plan, layers), 1):
        for bi in range(blocks):
            has_down = bi == 0 and (stride != 1 or inplanes != planes * expansion)
            x = _block(sd, x, f"layer{li}.{bi}", bottleneck,
                       stride if bi == 0 else 1, dilation, has_down)
            inplanes = planes * expansion
        feats.append(x)
    _, _, x3, x4 = feats

    h, w = x4.shape[2], x4.shape[3]
    priors = []
    for i, size in enumerate((1, 2, 3, 6)):
        p = F.adaptive_avg_pool2d(x4, (size, size))
        p = _abn(sd, _conv(sd, p, f"pspmodule.stages.{i}.1"),
                 f"pspmodule.stages.{i}.2", "leaky_relu")
        priors.append(F.interpolate(p, size=(h, w), mode="bilinear",
                                    align_corners=True))
    priors.append(x4)
    y = torch.cat(priors, dim=1)
    y = _abn(sd, _conv(sd, y, "pspmodule.bottleneck.0"),
             "pspmodule.bottleneck.1", "leaky_relu")
    logits = _conv(sd, y, "head", bias=True)

    d = _abn(sd, _conv(sd, x3, "dsn.0", bias=True), "dsn.1", "leaky_relu")
    dsn = _conv(sd, d, "dsn.3", bias=True)
    return logits, dsn, y


@pytest.mark.parametrize("block,layers", [("basic", (1, 1, 1, 1)),
                                          ("bottleneck", (1, 1, 1, 1))])
def test_flax_forward_matches_torch_oracle(block, layers):
    model = ResPSPNet(block=block, layers=layers, num_classes=7)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # randomize BN running stats so the ABN convention is actually exercised
    variables = jax.tree.map(lambda a: a, variables)
    stats = jax.tree.map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) + 0.5),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    ours = model.apply(variables, jnp.asarray(x), train=False)
    sd = ckpt.export_torch_respspnet(variables)
    theirs = torch_oracle_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), block, layers, 7)

    for idx, (name, t_out) in enumerate(zip(("logits", "dsn", "feat_psp"), theirs)):
        np.testing.assert_allclose(
            np.asarray(ours[idx]),
            t_out.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4, err_msg=name,
        )


# -------------------------------------------------------------- discriminator
def _l2n(v):
    return v / (v.norm() + 1e-12)


def _snconv(sd, x, prefix, stride=2, pad=1):
    """reference networks/spectral.py:23-35: one power iteration from the
    stored u, then w_bar / sigma."""
    w = _t(sd, f"{prefix}.0.module.weight_bar")
    u = _t(sd, f"{prefix}.0.module.weight_u")
    b = _t(sd, f"{prefix}.0.module.bias")
    h = w.shape[0]
    wm = w.reshape(h, -1)
    v = _l2n(torch.mv(wm.t(), u))
    u = _l2n(torch.mv(wm, v))
    sigma = u.dot(wm.mv(v))
    return F.conv2d(x, w / sigma, b, stride=stride, padding=pad)


def _attn(sd, x, prefix):
    """reference networks/sagan_models.py:9-41."""
    B, C, H, W = x.shape
    conv1x1 = lambda t, name: F.conv2d(t, _t(sd, f"{prefix}.{name}.weight"),
                                       _t(sd, f"{prefix}.{name}.bias"))
    pq = conv1x1(x, "query_conv").view(B, -1, H * W).permute(0, 2, 1)
    pk = conv1x1(x, "key_conv").view(B, -1, H * W)
    attention = F.softmax(torch.bmm(pq, pk), dim=-1)
    pv = conv1x1(x, "value_conv").view(B, -1, H * W)
    out = torch.bmm(pv, attention.permute(0, 2, 1)).view(B, C, H, W)
    return _t(sd, f"{prefix}.gamma") * out + x


def torch_d_oracle(sd, x):
    # preprocess mode 1: stock BatchNorm2d, eval stats (sagan_models.py:148)
    w, b = _t(sd, "preprocess_additional.weight"), _t(sd, "preprocess_additional.bias")
    m = _t(sd, "preprocess_additional.running_mean")
    var = _t(sd, "preprocess_additional.running_var")
    x = (x - m[None, :, None, None]) / torch.sqrt(var[None, :, None, None] + 1e-5)
    x = x * w[None, :, None, None] + b[None, :, None, None]
    out = F.leaky_relu(_snconv(sd, x, "l1"), 0.1)
    out = F.leaky_relu(_snconv(sd, out, "l2"), 0.1)
    out = F.leaky_relu(_snconv(sd, out, "l3"), 0.1)
    out = _attn(sd, out, "attn1")
    out = F.leaky_relu(_snconv(sd, out, "l4"), 0.1)
    out = _attn(sd, out, "attn2")
    return F.conv2d(out, _t(sd, "last.0.weight"), _t(sd, "last.0.bias"))


def test_discriminator_forward_matches_torch_oracle():
    from structure_knowledge_distillation_tpu.models import Discriminator

    model = Discriminator(preprocess_mode=1, image_size=65, conv_dim=8)
    rng = np.random.RandomState(7)
    x = rng.randn(2, 65, 65, 19).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def randomize(tree, fn):
        return jax.tree.map(lambda a: jnp.asarray(fn(a).astype(np.float32)), tree)

    variables = {
        "params": randomize(variables["params"], lambda a: rng.randn(*a.shape) * 0.2),
        "batch_stats": {"preprocess_bn": {
            "mean": jnp.asarray(rng.randn(19).astype(np.float32)),
            "var": jnp.asarray((rng.rand(19) + 0.5).astype(np.float32)),
        }},
        "spectral": randomize(variables["spectral"], lambda a: rng.randn(*a.shape)),
    }

    ours, _, _ = model.apply(variables, jnp.asarray(x), train=False)
    sd = ckpt.export_torch_discriminator(variables)
    theirs = torch_d_oracle(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-4)


def test_snconv_power_iteration_trajectory_matches_torch():
    """Multi-step spectral-norm trajectory: K=4 consecutive SNConv forwards
    (update_stats=True) vs a literal torch loop of the reference wrapper
    (networks/spectral.py:23-35) — u, v, sigma, and conv output at EVERY
    step, over random conv geometries. One-step parity is covered inside the
    D oracle; this pins the persistent-state recurrence u_{k+1} = f(w, u_k)
    at the op level."""
    from structure_knowledge_distillation_tpu.ops.spectral import SNConv

    rng = np.random.RandomState(21)
    for trial in range(4):
        cin = int(rng.randint(1, 8))
        cout = int(rng.randint(1, 10))
        k = int(rng.choice([1, 3, 4]))
        stride = int(rng.choice([1, 2]))
        hw = int(rng.randint(k + 1, 12))
        mod = SNConv(features=cout, kernel_size=(k, k), strides=(stride, stride),
                     padding=(k // 2, k // 2))
        x0 = jnp.asarray(rng.randn(2, hw, hw, cin).astype(np.float32))
        variables = mod.init(jax.random.PRNGKey(trial), x0, update_stats=False)
        params, spectral = variables["params"], variables["spectral"]
        # randomize u to a non-normalized-from-init state
        u = rng.randn(cout).astype(np.float32)
        u /= np.linalg.norm(u) + 1e-12
        spectral = {"u": jnp.asarray(u), "v": spectral["v"]}

        w_hwio = np.asarray(params["weight"], np.float32)
        tw = torch.from_numpy(w_hwio.transpose(3, 2, 0, 1)).clone()  # OIHW
        tb = torch.from_numpy(np.asarray(params["bias"], np.float32)).clone()
        tu = torch.from_numpy(u).clone()

        for step in range(4):
            x = jnp.asarray(rng.randn(2, hw, hw, cin).astype(np.float32))
            y, mut = mod.apply({"params": params, "spectral": spectral}, x,
                               update_stats=True, mutable=["spectral"])
            spectral = mut["spectral"]

            wm = tw.reshape(cout, -1)
            tv = _l2n(torch.mv(wm.t(), tu))
            tu = _l2n(torch.mv(wm, tv))
            sigma = tu.dot(wm.mv(tv))
            ty = F.conv2d(torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2)),
                          tw / sigma, tb, stride=stride, padding=k // 2)
            msg = (f"trial {trial} step {step}: cin={cin} cout={cout} k={k} "
                   f"stride={stride}")
            np.testing.assert_allclose(np.asarray(spectral["u"]), tu.numpy(),
                                       rtol=1e-4, atol=1e-5, err_msg=msg)
            np.testing.assert_allclose(np.asarray(spectral["v"]), tv.numpy(),
                                       rtol=1e-4, atol=1e-5, err_msg=msg)
            np.testing.assert_allclose(
                np.asarray(y), ty.detach().numpy().transpose(0, 2, 3, 1),
                rtol=1e-4, atol=1e-5, err_msg=msg)
