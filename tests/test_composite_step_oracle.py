"""Composite parity: the jitted KD train step vs a literal torch
implementation of `NetModel.optimize_parameters` (reference
networks/kd_model.py:118-173) — one step, and a 3-step trajectory with
persistent optimizers (momentum/schedule/BN/spectral state carried across
step boundaries).

Every loss, the SGD rule, the spectral update count, and each model forward
are individually parity-tested elsewhere; this test is the composition gate:
one full step — teacher eval forward, student train forward, the 4-term
weighted G loss (CE-DSN + λ_pi·Pi + λ_pa·Pa + λ_d·AdvG), the G SGD update,
then the D loss λ_d·(adv + λ_gp·GP) with its three train-mode D applications
(D(T), D(S), D(interp)) and the D SGD update — must reproduce the torch
reference's losses AND post-step parameters. It fails if any λ-weighting,
detach point, update order, running-stat advance, or spectral-state advance
diverges.

The torch side is a train-mode functional re-implementation over the
exported state dicts (same oracle style as test_torch_forward_parity):
  * ABN train mode: biased batch variance for normalization, γ=|w|+eps,
    Bessel-corrected running update with momentum 0.1 (reference
    libs/functions.py:91,209);
  * SNConv: v=l2n(Wᵀu), u=l2n(Wv) per application with persisted u
    (reference networks/spectral.py:23-35), σ differentiable through W only;
  * losses per utils/criterion.py (CE-DSN :168-188, Pi :211-226,
    Pa :228-245, adv :92-166);
  * torch.optim.SGD(momentum, weight_decay) == our optax chain
    (kd_model.py:59-66).

Dropout is disabled (drop_rate=0) on both sides — mask RNG cannot be shared
across frameworks; dropout PLACEMENT is covered by the structural forward
parity tests. The GP's α is jax-random-deterministic, so the test computes
the identical α and feeds it to the torch side.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from structure_knowledge_distillation_tpu.config import TrainConfig
from structure_knowledge_distillation_tpu.models import Discriminator, ResPSPNet
from structure_knowledge_distillation_tpu.training import (
    checkpoint as ckpt,
    create_train_state,
    make_sgd,
    make_train_step,
)

pytestmark = pytest.mark.slow  # full-model torch composite oracle (multi-minute compiles)

EPS = 1e-5
CLASSES = 7


# ---------------------------------------------------------------- torch side
def _l2n(v):
    return v / (v.norm() + 1e-12)


class TorchNetState:
    """Exported state dict as live torch tensors (params require grad)."""

    _STATE_LEAVES = ("running_mean", "running_var", "weight_u", "weight_v")

    def __init__(self, sd, trainable: bool):
        self.t = {}
        for k, v in sd.items():
            ten = torch.tensor(np.asarray(v), dtype=torch.float32)
            is_param = not k.endswith(self._STATE_LEAVES)
            ten.requires_grad_(trainable and is_param)
            self.t[k] = ten

    def __getitem__(self, k):
        return self.t[k]

    def __setitem__(self, k, v):
        self.t[k] = v

    def params(self):
        return [p for p in self.t.values() if p.requires_grad]

    def numpy(self):
        return {k: v.detach().numpy().copy() for k, v in self.t.items()}


def _conv_t(st, x, key, stride=1, dilation=1, bias=False):
    w = st[f"{key}.weight"]
    b = st[f"{key}.bias"] if bias else None
    pad = dilation * (w.shape[-1] - 1) // 2
    return F.conv2d(x, w, b, stride=stride, padding=pad, dilation=dilation)


def _abn_t(st, x, key, activation="none", train=False, abs_gamma=True):
    w, b = st[f"{key}.weight"], st[f"{key}.bias"]
    gamma = w.abs() + EPS if abs_gamma else w
    if train:
        mean = x.mean(dim=(0, 2, 3))
        var = x.var(dim=(0, 2, 3), unbiased=False)
        with torch.no_grad():
            n = x.numel() // x.shape[1]
            bessel = n / max(n - 1, 1)
            st[f"{key}.running_mean"].mul_(0.9).add_(0.1 * mean.detach())
            st[f"{key}.running_var"].mul_(0.9).add_(0.1 * bessel * var.detach())
    else:
        mean, var = st[f"{key}.running_mean"], st[f"{key}.running_var"]
    y = (x - mean[None, :, None, None]) / torch.sqrt(var[None, :, None, None] + EPS)
    y = y * gamma[None, :, None, None] + b[None, :, None, None]
    if activation == "leaky_relu":
        y = F.leaky_relu(y, 0.01)
    return y


def _block_t(st, x, prefix, bottleneck, stride, dilation, has_down, train):
    if bottleneck:
        h = F.relu(_abn_t(st, _conv_t(st, x, f"{prefix}.conv1"), f"{prefix}.bn1",
                          train=train))
        h = F.relu(_abn_t(st, _conv_t(st, h, f"{prefix}.conv2", stride, dilation),
                          f"{prefix}.bn2", train=train))
        h = _abn_t(st, _conv_t(st, h, f"{prefix}.conv3"), f"{prefix}.bn3",
                   train=train)
    else:
        h = F.relu(_abn_t(st, _conv_t(st, x, f"{prefix}.conv1", stride, dilation),
                          f"{prefix}.bn1", train=train))
        h = _abn_t(st, _conv_t(st, h, f"{prefix}.conv2", 1, dilation),
                   f"{prefix}.bn2", train=train)
    res = x
    if has_down:
        res = _abn_t(st, _conv_t(st, x, f"{prefix}.downsample.0", stride),
                     f"{prefix}.downsample.1", train=train)
    return F.relu(h + res)


def respspnet_t(st, x, block, layers, train):
    """Train/eval-mode torch functional Res_pspnet
    (reference networks/pspnet_combine.py:116-191)."""
    x = F.relu(_abn_t(st, _conv_t(st, x, "conv1", stride=2), "bn1", train=train))
    x = F.relu(_abn_t(st, _conv_t(st, x, "conv2"), "bn2", train=train))
    x = F.relu(_abn_t(st, _conv_t(st, x, "conv3"), "bn3", train=train))
    x = F.max_pool2d(x, 3, 2, 1, ceil_mode=True)

    bottleneck = block == "bottleneck"
    expansion = 4 if bottleneck else 1
    inplanes = 128
    plan = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
    feats = []
    for li, ((planes, stride, dilation), blocks) in enumerate(zip(plan, layers), 1):
        for bi in range(blocks):
            has_down = bi == 0 and (stride != 1 or inplanes != planes * expansion)
            x = _block_t(st, x, f"layer{li}.{bi}", bottleneck,
                         stride if bi == 0 else 1, dilation, has_down, train)
            inplanes = planes * expansion
        feats.append(x)
    _, _, x3, x4 = feats

    h, w = x4.shape[2], x4.shape[3]
    priors = []
    for i, size in enumerate((1, 2, 3, 6)):
        p = F.adaptive_avg_pool2d(x4, (size, size))
        p = _abn_t(st, _conv_t(st, p, f"pspmodule.stages.{i}.1"),
                   f"pspmodule.stages.{i}.2", "leaky_relu", train=train)
        priors.append(F.interpolate(p, size=(h, w), mode="bilinear",
                                    align_corners=True))
    priors.append(x4)
    y = torch.cat(priors, dim=1)
    y = _abn_t(st, _conv_t(st, y, "pspmodule.bottleneck.0"),
               "pspmodule.bottleneck.1", "leaky_relu", train=train)
    logits = _conv_t(st, y, "head", bias=True)

    d = _abn_t(st, _conv_t(st, x3, "dsn.0", bias=True), "dsn.1", "leaky_relu",
               train=train)
    dsn = _conv_t(st, d, "dsn.3", bias=True)
    return logits, dsn, y


def _snconv_t(st, x, prefix):
    """One power iteration from the persisted u per application
    (reference networks/spectral.py:23-35); σ carries grad through W only."""
    w = st[f"{prefix}.0.module.weight_bar"]
    u = st[f"{prefix}.0.module.weight_u"]
    b = st[f"{prefix}.0.module.bias"]
    wm = w.reshape(w.shape[0], -1)
    with torch.no_grad():
        v = _l2n(wm.detach().t() @ u)
        u_new = _l2n(wm.detach() @ v)
    sigma = u_new @ (wm @ v)
    st[f"{prefix}.0.module.weight_u"] = u_new
    st[f"{prefix}.0.module.weight_v"] = v
    return F.conv2d(x, w / sigma, b, stride=2, padding=1)


def _attn_t(st, x, prefix):
    B, C, H, W = x.shape
    conv1x1 = lambda t, n: F.conv2d(t, st[f"{prefix}.{n}.weight"],
                                    st[f"{prefix}.{n}.bias"])
    pq = conv1x1(x, "query_conv").view(B, -1, H * W).permute(0, 2, 1)
    pk = conv1x1(x, "key_conv").view(B, -1, H * W)
    attention = F.softmax(torch.bmm(pq, pk), dim=-1)
    pv = conv1x1(x, "value_conv").view(B, -1, H * W)
    out = torch.bmm(pv, attention.permute(0, 2, 1)).view(B, C, H, W)
    return st[f"{prefix}.gamma"] * out + x


def d_forward_t(st, x, image_size, train=True):
    """Train-mode SAGAN discriminator (reference sagan_models.py:105-168),
    preprocess mode 1 (stock BatchNorm2d)."""
    x = _abn_t(st, x, "preprocess_additional", train=train, abs_gamma=False)
    out = F.leaky_relu(_snconv_t(st, x, "l1"), 0.1)
    out = F.leaky_relu(_snconv_t(st, out, "l2"), 0.1)
    out = F.leaky_relu(_snconv_t(st, out, "l3"), 0.1)
    out = _attn_t(st, out, "attn1")
    if image_size == 65:
        out = F.leaky_relu(_snconv_t(st, out, "l4"), 0.1)
    out = _attn_t(st, out, "attn2")
    return F.conv2d(out, st["last.0.weight"], st["last.0.bias"])


# ------------------------------------------------------------- torch losses
def criterion_dsn_t(logits, dsn, labels, dsn_weight=0.4):
    hw = labels.shape[1:]
    up = lambda t: F.interpolate(t, size=hw, mode="bilinear", align_corners=True)
    ce = lambda t: F.cross_entropy(up(t), labels, ignore_index=255)
    return ce(logits) + dsn_weight * ce(dsn)


def pixel_wise_t(s_logits, t_logits):
    _, _, h, w = s_logits.shape
    p_t = F.softmax(t_logits.detach(), dim=1)
    logp_s = F.log_softmax(s_logits, dim=1)
    return (-p_t * logp_s).sum() / (h * w)


def pairwise_t(feat_s, feat_t, scale):
    h, w = feat_t.shape[2], feat_t.shape[3]
    kh, kw = int(h * scale), int(w * scale)
    pool = lambda f: F.max_pool2d(f, (kh, kw), (kh, kw), ceil_mode=True)
    fs, ft = pool(feat_s), pool(feat_t.detach())

    def gram(f):
        norm = f.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-8
        f = f / norm.detach()
        B, C, H, W = f.shape
        fm = f.reshape(B, C, H * W)
        return torch.bmm(fm.transpose(1, 2), fm)

    n, _, hh, ww = ft.shape
    diff = gram(ft).detach() - gram(fs)
    return diff.pow(2).sum() / ((hh * ww) ** 2) / n


def torch_optimize_parameters(st_t, st_s, st_d, images, labels, cfg, alpha,
                              g_opt=None, d_opt=None, lr_g=None, lr_d=None):
    """Literal functional `optimize_parameters` (kd_model.py:118-173 +
    criterion.py): returns the loss scalars after performing both updates.

    Pass persistent `g_opt`/`d_opt` (and per-step `lr_g`/`lr_d`, the
    reference's adjust_learning_rate, kd_model.py:110-117) to run multi-step
    trajectories with momentum buffers carried across steps."""
    if g_opt is None:
        g_opt = torch.optim.SGD(st_s.params(), lr=cfg.lr_g,
                                momentum=cfg.momentum,
                                weight_decay=cfg.weight_decay)
    if d_opt is None:
        d_opt = torch.optim.SGD(st_d.params(), lr=cfg.lr_d,
                                momentum=cfg.momentum,
                                weight_decay=cfg.weight_decay)
    if lr_g is not None:
        for pg in g_opt.param_groups:
            pg["lr"] = lr_g
    if lr_d is not None:
        for pg in d_opt.param_groups:
            pg["lr"] = lr_d
    imsize = cfg.imsize_for_adv

    with torch.no_grad():
        t_logits, t_dsn, t_feat = respspnet_t(
            st_t, images, "bottleneck", (1, 1, 1, 1), train=False)
    s_logits, s_dsn, s_feat = respspnet_t(
        st_s, images, "basic", (1, 1, 1, 1), train=True)

    mc = criterion_dsn_t(s_logits, s_dsn, labels)
    g_loss = mc
    losses = {"mc_loss": mc.item()}
    if cfg.pi:
        pi = pixel_wise_t(s_logits, t_logits)
        g_loss = g_loss + cfg.lambda_pi * pi
        losses["pi_loss"] = pi.item()
    if cfg.pa:
        pa = pairwise_t(s_feat, t_feat, cfg.pool_scale)
        g_loss = g_loss + cfg.lambda_pa * pa
        losses["pa_loss"] = pa.item()
    d_out_s_for_g = d_forward_t(st_d, s_logits, imsize)
    adv_g = -d_out_s_for_g.mean()
    g_loss = g_loss + cfg.lambda_d * adv_g
    losses["adv_g_loss"] = adv_g.item()
    g_opt.zero_grad()
    d_opt.zero_grad()
    g_loss.backward()
    g_opt.step()

    # discriminator_backward: D(T), D(S), then (wgan-gp only) GP on the
    # α-interpolation (criterion.py:139-166 both adv types, :92-120 GP)
    d_opt.zero_grad()
    out_t = d_forward_t(st_d, t_logits.detach(), imsize)
    out_s = d_forward_t(st_d, s_logits.detach(), imsize)
    if cfg.adv_loss_type == "hinge":
        d_loss = cfg.lambda_d * (F.relu(1.0 - out_t).mean()
                                 + F.relu(1.0 + out_s).mean())
    else:
        d_loss = cfg.lambda_d * (out_s.mean() - out_t.mean())
        interp = (alpha * t_logits.detach()
                  + (1.0 - alpha) * s_logits.detach()).requires_grad_(True)
        gp_out = d_forward_t(st_d, interp, imsize)
        grad = torch.autograd.grad(gp_out.sum(), interp, create_graph=True)[0]
        gn = grad.reshape(grad.shape[0], -1).norm(dim=1)
        gp = cfg.lambda_gp * ((gn - 1.0) ** 2).mean()
        d_loss = d_loss + cfg.lambda_d * gp
    d_loss.backward()
    d_opt.step()

    losses.update({"g_loss": g_loss.item(), "d_loss": d_loss.item()})
    return losses


# ------------------------------------------------------------------ the test
def _randomized_vars(rng_np, template):
    """Conv kernels keep their (already random, variance-scaled) init; 1-D
    affine/bias leaves are randomized with mixed signs so the γ=|w|+eps
    convention is exercised in train mode; running means N(0,0.1²), running
    vars [0.5,1.5); spectral u/v stay l2-normalized."""
    def param(path, a):
        if a.ndim == 1 and path[-1].key == "weight":
            sign = np.where(rng_np.rand(*a.shape) < 0.25, -1.0, 1.0)
            return jnp.asarray((sign * (rng_np.rand(*a.shape) + 0.5))
                               .astype(np.float32))
        if a.ndim == 1:  # biases
            return jnp.asarray((rng_np.randn(*a.shape) * 0.1).astype(np.float32))
        return a

    out = {"params": jax.tree_util.tree_map_with_path(param, template["params"])}
    if "batch_stats" in template:
        out["batch_stats"] = jax.tree_util.tree_map_with_path(
            lambda path, a: jnp.asarray(
                (rng_np.randn(*a.shape) * 0.1).astype(np.float32)
                if path[-1].key == "mean"
                else (rng_np.rand(*a.shape) + 0.5).astype(np.float32)),
            template["batch_stats"])
    if "spectral" in template:
        def unit(a):
            v = rng_np.randn(*a.shape).astype(np.float32)
            return jnp.asarray(v / (np.linalg.norm(v) + 1e-12))
        out["spectral"] = jax.tree.map(unit, template["spectral"])
    return out


def _run_composite(adv_loss_type: str, pi: bool, pa: bool, n_steps: int = 1,
                   remat: bool = False, use_loop: bool = False):
    # Trajectory runs use a SHORT schedule (num_steps=4): the poly lr then
    # decays 25%/step, so a frozen or mis-offset schedule shifts the
    # cumulative update by ~50% — far above the measured f32 drift floor
    # (see the trajectory test's tolerance note).
    cfg = TrainConfig(
        classes_num=CLASSES, batch_size=2, input_size=(256, 256),
        imsize_for_adv=33, adv_conv_dim=16, num_steps=100 if n_steps == 1 else 4,
        pi=pi, pa=pa, ho=True, adv_loss_type=adv_loss_type,
        lambda_pi=10.0, lambda_pa=0.7, lambda_d=0.13, lambda_gp=10.0,
        pool_scale=0.5, compute_dtype="float32",
    )
    teacher = ResPSPNet(block="bottleneck", layers=(1, 1, 1, 1),
                        num_classes=CLASSES, drop_rate=0.0)
    student = ResPSPNet(block="basic", layers=(1, 1, 1, 1),
                        num_classes=CLASSES, drop_rate=0.0, remat=remat)
    disc = Discriminator(preprocess_mode=1, image_size=cfg.imsize_for_adv,
                         conv_dim=cfg.adv_conv_dim)

    rng_np = np.random.RandomState(42)
    key = jax.random.PRNGKey(0)
    images_k = rng_np.randn(n_steps, 2, 256, 256, 3).astype(np.float32)
    labels_k = rng_np.randint(0, CLASSES,
                              (n_steps, 2, 256, 256)).astype(np.int32)
    labels_k[:, 0, :16] = 255  # exercise ignore_index
    images, labels = images_k[0], labels_k[0]

    t_tmpl = teacher.init(key, jnp.asarray(images[:1]), train=False)
    s_tmpl = student.init(key, jnp.asarray(images[:1]), train=False)
    d_tmpl = disc.init(key, jnp.zeros((1, 33, 33, CLASSES)), train=False)
    t_vars = _randomized_vars(rng_np, t_tmpl)
    s_vars = _randomized_vars(rng_np, s_tmpl)
    d_vars = _randomized_vars(rng_np, d_tmpl)

    g_tx = make_sgd(cfg.lr_g, cfg.num_steps, cfg.power, cfg.momentum,
                    cfg.weight_decay)
    d_tx = make_sgd(cfg.lr_d, cfg.num_steps, cfg.power, cfg.momentum,
                    cfg.weight_decay)
    state = create_train_state(jax.random.PRNGKey(7), t_vars, s_vars, d_vars,
                               g_tx, d_tx)

    # export BEFORE the step (torch starts from identical state)
    sd_t = ckpt.export_torch_respspnet(t_vars)
    sd_s = ckpt.export_torch_respspnet(s_vars)
    sd_d = ckpt.export_torch_discriminator(d_vars)

    # --- torch state + PERSISTENT optimizers (momentum buffers carry across
    # steps, exactly the reference's two long-lived SGDs, kd_model.py:74-75)
    st_t = TorchNetState(sd_t, trainable=False)
    st_s = TorchNetState(sd_s, trainable=True)
    st_d = TorchNetState(sd_d, trainable=True)
    before_s, before_d = st_s.numpy(), st_d.numpy()
    g_opt = torch.optim.SGD(st_s.params(), lr=cfg.lr_g, momentum=cfg.momentum,
                            weight_decay=cfg.weight_decay)
    d_opt = torch.optim.SGD(st_d.params(), lr=cfg.lr_d, momentum=cfg.momentum,
                            weight_decay=cfg.weight_decay)

    # --- jax side first: per-step dispatch (production single-step path),
    # the scanned make_train_loop program (use_loop — the production chunked
    # dispatch), with or without student rematerialization (remat). All
    # variants must land inside the same torch-parity envelope.
    step_fn_raw = make_train_step(cfg, teacher, student, disc, g_tx, d_tx)
    step_fn = jax.jit(step_fn_raw)
    rng0 = state.rng
    init_state = state
    if use_loop:
        from structure_knowledge_distillation_tpu.training.train_step import (
            make_train_loop,
        )

        loop = jax.jit(make_train_loop(step_fn_raw, n_steps))

        def run_traj(s):
            s, mk = loop(s, jnp.asarray(images_k), jnp.asarray(labels_k))
            return s, mk

        state, metrics_k = run_traj(state)
        jax_metrics = [
            {k: float(np.asarray(v)[i]) for k, v in metrics_k.items()}
            for i in range(n_steps)
        ]
    else:
        def run_traj(s):
            m = None
            for i in range(n_steps):
                s, m = step_fn(s, jnp.asarray(images_k[i]),
                               jnp.asarray(labels_k[i]))
            return s, m

        jax_metrics = []
        for i in range(n_steps):
            state, metrics = step_fn(state, jnp.asarray(images_k[i]),
                                     jnp.asarray(labels_k[i]))
            jax_metrics.append({k: float(v) for k, v in metrics.items()})

    # --- torch side, compared per step
    for i in range(n_steps):
        metrics = jax_metrics[i]

        # the identical GP α (per-step rng = fold_in(rng, step) is
        # deterministic: train_step.py:78-79)
        _, gp_rng = jax.random.split(jax.random.fold_in(rng0, i))
        alpha = torch.tensor(np.asarray(
            jax.random.uniform(gp_rng, (2, 1, 1, 1), jnp.float32)))
        # reference adjust_learning_rate: poly decay evaluated at step i for
        # BOTH optimizers (kd_model.py:110-117)
        frac = (cfg.num_steps - i) / cfg.num_steps
        t_losses = torch_optimize_parameters(
            st_t, st_s, st_d,
            torch.tensor(images_k[i].transpose(0, 3, 1, 2)),
            torch.tensor(labels_k[i].astype(np.int64)), cfg, alpha,
            g_opt=g_opt, d_opt=d_opt,
            lr_g=cfg.lr_g * frac ** cfg.power,
            lr_d=cfg.lr_d * frac ** cfg.power)

        # losses agree at EVERY step. Tolerances are calibrated to MEASURED
        # chaotic drift, not wishful tightness: the two f32 trajectories
        # accumulate reductions in different orders (≈1e-3 relative per-step
        # update noise), and the GAN dynamics amplify that through the
        # near-zero-mean adversarial terms (measured: adv_g 22% relative by
        # step 1 while every parameter tensor stays within 1.2e-1/5e-3
        # rel-L2 and no tensor diverges structurally). Semantic errors —
        # dropped momentum, frozen schedule, reset BN/spectral state — move
        # these losses and the cumulative updates by O(1).
        rtol = (2e-3, 5e-2, 1e-1)[min(i, 2)]
        atol = (2e-4, 2e-2, 5e-2)[min(i, 2)]
        for k in t_losses:
            np.testing.assert_allclose(metrics[k], t_losses[k], rtol=rtol,
                                       atol=atol, err_msg=f"step{i}:{k}")
    new_state = state
    del state

    # --- post-step state agrees: compare UPDATES (new − old), which is where
    # a wrong λ, detach, or order shows up at full magnitude
    after_s = ckpt.export_torch_respspnet(
        {"params": new_state.student_params,
         "batch_stats": new_state.student_stats})
    after_d = ckpt.export_torch_discriminator(
        {"params": new_state.d_params, "batch_stats": new_state.d_stats,
         "spectral": new_state.d_spectral})
    torch_after_s, torch_after_d = st_s.numpy(), st_d.numpy()

    # Single-step: per-element within 6% of the tensor's max update (f32
    # accumulation order differs — the JAX PSP bottleneck is the factored
    # form), whole-update rel L2 < 2%, cosine > 0.999 — a wrong λ, detach,
    # or order moves these by O(1). Trajectory (n_steps > 1): thresholds
    # follow the measured chaotic-drift envelope (max 1.2e-1 rel-L2 after 3
    # steps) with ~2.5× margin; a dropped momentum buffer, frozen schedule,
    # or reset BN/spectral state still lands far outside them.
    if n_steps == 1:
        elem_tol, rel_tol, cos_tol = 6e-2, 2e-2, 0.999
    else:
        # Per-tensor cosine at trajectory length is chaos-limited: the
        # remat/loop variants re-draw reduction-order noise at EVERY step
        # (unlike the one-time init perturbation of the chaos-floor control)
        # and land single mid-size tensors at measured cos ≈ 0.937 while the
        # whole-model update direction stays within the chaos floor. The
        # variants' exact semantics are proven JAX-vs-JAX elsewhere
        # (test_device_loop_matches_sequential_steps, test_remat_*): here
        # 0.90 catches structural divergence (a wrong λ/detach flips or
        # zeroes whole tensors, cos ≲ 0.5), not rounding.
        elem_tol, rel_tol, cos_tol = None, 3e-1, 0.90

    def compare(after_jax, before, torch_after, label):
        # Trajectory runs get an ABSOLUTE per-tensor floor tied to the whole
        # model's update norm: tensors whose update is a sliver of the total
        # (e.g. a deep BN bias, ~1% of the update vector) are chaos-dominated
        # — measured: the remat/loop variants' different instruction order
        # lands single small tensors at ~0.32 rel while the whole-vector
        # drift stays at the ~8e-2 chaos floor. A semantic bug localized to
        # one small tensor (frozen bias, dropped update) is caught by the
        # 1-step test's tight per-element envelope, which has no floor.
        gnorm = np.linalg.norm(np.concatenate(
            [(torch_after[k] - before[k]).ravel() for k in sorted(after_jax)]))
        floor = 0.0 if n_steps == 1 else 2e-2 * gnorm
        for k in after_jax:
            dj = after_jax[k] - before[k]
            dt = torch_after[k] - before[k]
            if elem_tol is not None:
                scale = max(np.abs(dt).max(), np.abs(dj).max(), 1e-12)
                np.testing.assert_allclose(
                    dj, dt, rtol=0, atol=max(elem_tol * scale, 1e-7),
                    err_msg=f"{label}:{k}")
            nt = np.linalg.norm(dt)
            if nt > 1e-7:
                err = float(np.linalg.norm(dj - dt))
                assert err < max(rel_tol * nt, floor), (label, k, err / nt)
                cos = float(np.dot(dj.ravel(), dt.ravel())
                            / (np.linalg.norm(dj) * nt + 1e-30))
                if nt > floor:
                    assert cos > cos_tol, (label, k, cos)
                elif nt > 0.1 * floor:
                    # Sub-floor tensors: MAGNITUDE is chaos-dominated (the
                    # floor exists because reduction-order noise lands them
                    # at ~0.3 rel), but the update DIRECTION still has to
                    # correlate — a frozen (dj=0), sign-flipped, or reset
                    # small tensor shows cos ≤ 0 while chaos keeps
                    # cos ≳ 0.95. Tensors under 10% of the floor (< 0.2% of
                    # the model update) are below any measurable signal.
                    assert cos > 0.5, (label, k, cos, "sub-floor direction")

    compare(after_s, before_s, torch_after_s, "student")
    compare(after_d, before_d, torch_after_d, "discriminator")

    if n_steps > 1:
        # --- chaos-floor control: justify the trajectory envelope as
        # measured f32 chaos, not slack. Re-run the SAME jax trajectory
        # (through the SAME compiled path — per-step, loop, or remat) from
        # an init perturbed at the f32 reduction-noise scale (1e-6 relative
        # on student+D params — the order-of-magnitude of a single
        # different-order f32 accumulation) and measure how far the GAN
        # dynamics amplify it by step n. The jax-vs-torch drift must sit
        # within a small factor of this self-drift: a semantic divergence
        # (wrong λ, dropped momentum, frozen schedule, reset BN/spectral
        # state) produces O(1) relative error regardless of the floor.
        rs = np.random.RandomState(123)

        def pert(x):
            a = np.asarray(x)
            noise = rs.standard_normal(a.shape).astype(a.dtype)
            return jnp.asarray(a * (1.0 + 1e-6 * noise))

        pstate = init_state.replace(
            student_params=jax.tree.map(pert, init_state.student_params),
            d_params=jax.tree.map(pert, init_state.d_params))
        pstate, _ = run_traj(pstate)
        after_s_pert = ckpt.export_torch_respspnet(
            {"params": pstate.student_params,
             "batch_stats": pstate.student_stats})

        def gvec(after, before):
            return np.concatenate(
                [(after[k] - before[k]).ravel() for k in sorted(after)])

        base = gvec(after_s, before_s)
        self_drift = np.linalg.norm(gvec(after_s_pert, before_s) - base)
        torch_drift = np.linalg.norm(gvec(torch_after_s, before_s) - base)
        denom = np.linalg.norm(base) + 1e-30
        chaos_rel, torch_rel = self_drift / denom, torch_drift / denom
        print(f"[chaos-floor] n_steps={n_steps}: self-perturbation(1e-6) "
              f"rel drift {chaos_rel:.3e}, jax-vs-torch rel drift "
              f"{torch_rel:.3e}")
        # The 50× factor over the measured self-drift is the live bound
        # (measured: self 9.2e-2, torch 1.5e-1 at 2 steps — so on this
        # platform the live bound governs with ~30× headroom). The ABSOLUTE
        # fallback covers the case where a platform/XLA version amplifies
        # the one-shot 1e-6 init perturbation less than the per-step
        # reduction-noise re-draw of the jax-vs-torch comparison (the two
        # are not the same noise process). It sits at 5e-2 (round-5,
        # tightened from 2.5e-1 per advisor review): low enough that a
        # ~20% semantic divergence (mildly wrong loss weight) cannot slip
        # through on a low-chaos platform, while any platform whose genuine
        # f32 drift exceeds it will also show a large chaos_rel and be
        # covered by the live bound. 5e-3 was platform-dependent — a
        # correct build with tiny chaos amplification would have failed
        # spuriously.
        assert torch_rel <= max(50.0 * chaos_rel, 5e-2), (torch_rel, chaos_rel)


def test_composite_one_step_matches_torch():
    """Flagship recipe: wgan-gp with all three distillation terms."""
    _run_composite("wgan-gp", pi=True, pa=True)


def test_composite_trajectory_matches_torch():
    """THREE consecutive optimizer steps with a fresh batch each: gates
    momentum-buffer persistence, the per-step poly-lr advance, BN
    running-stat threading, and the 4-per-step spectral u/v chain ACROSS
    step boundaries — the closest in-environment proxy to training-curve
    parity (one step cannot see a momentum or schedule error; momentum
    buffers are all zero on step 0)."""
    _run_composite("wgan-gp", pi=True, pa=True, n_steps=3)


def test_composite_one_step_matches_torch_hinge():
    """Hinge variant (no GP, 3 spectral updates/step) with pi/pa toggled
    off — also verifies the loss-toggle composition."""
    _run_composite("hinge", pi=False, pa=False)


def test_composite_trajectory_remat_matches_torch():
    """Production memory path (--remat): the student's per-block
    jax.checkpoint recomputes forwards in the backward — it must be
    numerically invisible, landing the 2-step trajectory inside the same
    torch-parity envelope as the plain student."""
    _run_composite("wgan-gp", pi=True, pa=True, n_steps=2, remat=True)


def test_composite_loop_unrolled_matches_torch():
    """Production chunked-dispatch path: ONE make_train_loop(unroll=2)
    program (the lax.scan device loop fit() dispatches) runs both steps in
    a single call — per-step rng folding, schedule advance, and state
    threading through the scan carry must all match the torch reference
    stepped sequentially."""
    _run_composite("wgan-gp", pi=True, pa=True, n_steps=2, use_loop=True)
