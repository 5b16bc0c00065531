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
