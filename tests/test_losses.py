"""Loss parity tests vs. literal torch translations of the reference formulas
(reference: utils/criterion.py, utils/utils.py:170-183)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from structure_knowledge_distillation_tpu.losses import (
    adv_loss_for_d,
    adv_loss_for_g,
    criterion_dsn,
    cross_entropy_ignore,
    gradient_penalty,
    pairwise_affinity_loss,
    pixel_wise_kl,
)


def nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def test_cross_entropy_ignore_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 8, 19).astype(np.float32)
    labels = rng.randint(0, 19, (2, 8, 8)).astype(np.int64)
    labels[0, :3] = 255
    ours = cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels))
    theirs = torch.nn.CrossEntropyLoss(ignore_index=255)(
        nchw(logits), torch.from_numpy(labels)
    )
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_cross_entropy_all_ignored_is_finite():
    logits = jnp.zeros((1, 4, 4, 5))
    labels = jnp.full((1, 4, 4), 255)
    assert np.isfinite(float(cross_entropy_ignore(logits, labels)))


def test_criterion_dsn_matches_reference_formula():
    rng = np.random.RandomState(1)
    main = rng.randn(2, 9, 9, 7).astype(np.float32)
    aux = rng.randn(2, 9, 9, 7).astype(np.float32)
    labels = rng.randint(0, 7, (2, 33, 33)).astype(np.int64)
    labels[:, 0] = 255
    ours = criterion_dsn(
        (jnp.asarray(main), jnp.asarray(aux)), jnp.asarray(labels)
    )
    ce = torch.nn.CrossEntropyLoss(ignore_index=255)
    up = lambda x: F.interpolate(nchw(x), size=(33, 33), mode="bilinear", align_corners=True)
    theirs = ce(up(main), torch.from_numpy(labels)) + 0.4 * ce(up(aux), torch.from_numpy(labels))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)


def test_pixel_wise_kl_matches_reference_formula():
    rng = np.random.RandomState(2)
    s = rng.randn(2, 9, 11, 19).astype(np.float32)
    t = rng.randn(2, 9, 11, 19).astype(np.float32)
    ours = pixel_wise_kl(jnp.asarray(s), jnp.asarray(t))
    # reference criterion.py:219-226, on NCHW with N,C,W,H = shape
    ts, tt = nchw(s), nchw(t)
    N, C, W, H = ts.shape
    softmax_t = F.softmax(tt.permute(0, 2, 3, 1).reshape(-1, C), dim=1)
    logsoftmax_s = F.log_softmax(ts.permute(0, 2, 3, 1).reshape(-1, C), dim=1)
    theirs = torch.sum(-softmax_t * logsoftmax_s) / W / H
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def _torch_sim_dis(f_s, f_t):
    """Literal translation of reference utils/utils.py:170-183 (NCHW)."""
    def L2(f):
        return (((f ** 2).sum(dim=1)) ** 0.5).reshape(f.shape[0], 1, f.shape[2], f.shape[3]) + 1e-8

    def similarity(feat):
        feat = feat.float()
        tmp = L2(feat).detach()
        feat = feat / tmp
        feat = feat.reshape(feat.shape[0], feat.shape[1], -1)
        return torch.einsum("icm,icn->imn", [feat, feat])

    sim_err = ((similarity(f_t) - similarity(f_s)) ** 2) / (
        (f_t.shape[-1] * f_t.shape[-2]) ** 2
    ) / f_t.shape[0]
    return sim_err.sum()


def test_pairwise_affinity_matches_reference_formula():
    rng = np.random.RandomState(3)
    # student 128ch, teacher 512ch, 65x65 like the real pipeline (scaled down)
    fs = rng.randn(2, 13, 13, 8).astype(np.float32)
    ft = rng.randn(2, 13, 13, 16).astype(np.float32)
    scale = 0.5
    ours = pairwise_affinity_loss(jnp.asarray(fs), jnp.asarray(ft), scale=scale)

    tfs, tft = nchw(fs), nchw(ft)
    total_w, total_h = tft.shape[2], tft.shape[3]
    kw, kh = int(total_w * scale), int(total_h * scale)
    pool = torch.nn.MaxPool2d(kernel_size=(kw, kh), stride=(kw, kh), padding=0, ceil_mode=True)
    theirs = _torch_sim_dis(pool(tfs), pool(tft))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)


def test_distill_losses_randomized_sweep():
    """Seeded random-shape sweep of Pi and Pa vs the literal torch
    translations — the fixed-shape tests above pin the recipe's geometry;
    this guards odd sizes, channel mixes, and every pool scale."""
    rng = np.random.RandomState(77)
    for _ in range(12):
        n = int(rng.randint(1, 4))
        h, w = int(rng.randint(2, 15)), int(rng.randint(2, 15))
        c = int(rng.randint(2, 12))
        s = rng.randn(n, h, w, c).astype(np.float32)
        t = rng.randn(n, h, w, c).astype(np.float32)
        ours = pixel_wise_kl(jnp.asarray(s), jnp.asarray(t))
        ts, tt = nchw(s), nchw(t)
        N, C, W, H = ts.shape
        softmax_t = F.softmax(tt.permute(0, 2, 3, 1).reshape(-1, C), dim=1)
        logsoftmax_s = F.log_softmax(ts.permute(0, 2, 3, 1).reshape(-1, C),
                                     dim=1)
        theirs = torch.sum(-softmax_t * logsoftmax_s) / W / H
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4,
                                   err_msg=f"pi {s.shape}")

    for _ in range(12):
        n = int(rng.randint(1, 3))
        h, w = int(rng.randint(4, 17)), int(rng.randint(4, 17))
        cs, ct = int(rng.randint(2, 9)), int(rng.randint(2, 17))
        scale = float(rng.choice([0.25, 0.5, 0.75, 1.0]))
        if int(h * scale) < 1 or int(w * scale) < 1:
            continue
        fs = rng.randn(n, h, w, cs).astype(np.float32)
        ft = rng.randn(n, h, w, ct).astype(np.float32)
        ours = pairwise_affinity_loss(jnp.asarray(fs), jnp.asarray(ft),
                                      scale=scale)
        tfs, tft = nchw(fs), nchw(ft)
        total_w, total_h = tft.shape[2], tft.shape[3]
        kw, kh = int(total_w * scale), int(total_h * scale)
        pool = torch.nn.MaxPool2d(kernel_size=(kw, kh), stride=(kw, kh),
                                  padding=0, ceil_mode=True)
        theirs = _torch_sim_dis(pool(tfs), pool(tft))
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-3,
                                   atol=1e-7,
                                   err_msg=f"pa {fs.shape} {ft.shape} {scale}")


def test_adv_losses_match_reference_formula():
    rng = np.random.RandomState(4)
    d_s = rng.randn(4, 1, 1, 1).astype(np.float32)
    d_t = rng.randn(4, 1, 1, 1).astype(np.float32)
    # G: -mean(fake) for both types
    np.testing.assert_allclose(
        float(adv_loss_for_g(jnp.asarray(d_s), "wgan-gp")), -d_s.mean(), rtol=1e-6
    )
    # D wgan: mean(fake) - mean(real)
    np.testing.assert_allclose(
        float(adv_loss_for_d(jnp.asarray(d_s), jnp.asarray(d_t), "wgan-gp")),
        d_s.mean() - d_t.mean(), rtol=1e-5, atol=1e-7,
    )
    # D hinge
    ours = float(adv_loss_for_d(jnp.asarray(d_s), jnp.asarray(d_t), "hinge"))
    theirs = float(
        torch.nn.ReLU()(1.0 - torch.from_numpy(d_t)).mean()
        + torch.nn.ReLU()(1.0 + torch.from_numpy(d_s)).mean()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_gradient_penalty_linear_d_analytic():
    """For D(x) = <k, x> the GP is exactly λ·(‖k‖−1)² regardless of α."""
    rng = np.random.RandomState(5)
    k = rng.randn(4, 4, 3).astype(np.float32)
    real = rng.randn(2, 4, 4, 3).astype(np.float32)
    fake = rng.randn(2, 4, 4, 3).astype(np.float32)

    def d_fn(x):
        return jnp.sum(x * jnp.asarray(k)[None], axis=(1, 2, 3))

    gp = gradient_penalty(d_fn, jnp.asarray(real), jnp.asarray(fake),
                          jax.random.PRNGKey(0), lambda_gp=10.0)
    expected = 10.0 * (np.linalg.norm(k.ravel()) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), expected, rtol=1e-5)


def test_gradient_penalty_matches_torch_nonlinear():
    """Same fixed α, nonlinear D — compare against torch double-backward."""
    rng = np.random.RandomState(6)
    w = rng.randn(3, 5).astype(np.float32)
    real = rng.randn(2, 2, 2, 3).astype(np.float32)
    fake = rng.randn(2, 2, 2, 3).astype(np.float32)
    alpha = rng.rand(2, 1, 1, 1).astype(np.float32)

    def d_jax(x):  # per-sample score: sum(tanh(x @ w))
        return jnp.sum(jnp.tanh(jnp.einsum("nhwc,cd->nhwd", x, jnp.asarray(w))), axis=(1, 2, 3))

    interp = jnp.asarray(alpha * real + (1 - alpha) * fake)
    g = jax.grad(lambda x: jnp.sum(d_jax(x)))(interp)
    ours = float(jnp.mean(jnp.square(jnp.sqrt(jnp.sum(jnp.square(g.reshape(2, -1)), axis=1)) - 1)))

    ti = torch.tensor(np.asarray(interp), requires_grad=True)
    out = torch.tanh(torch.einsum("nhwc,cd->nhwd", ti, torch.from_numpy(w))).sum()
    grad = torch.autograd.grad(out, ti, create_graph=True)[0].reshape(2, -1)
    theirs = float(((grad.pow(2).sum(dim=1).sqrt() - 1) ** 2).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_ohem_keeps_hardest_pixels():
    from structure_knowledge_distillation_tpu.losses import ohem_cross_entropy

    rng = np.random.RandomState(7)
    logits = rng.randn(1, 16, 16, 5).astype(np.float32) * 3.0
    labels = rng.randint(0, 5, (1, 16, 16))
    labels[0, :2] = 255
    # min_kept huge -> identical to plain masked CE over valid pixels
    loss_all = ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                  min_kept=10**7, factor=2)
    ce_all = cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(loss_all), float(ce_all), rtol=1e-5)

    # small min_kept -> mean over hardest pixels only (>= plain CE)
    loss_hard = ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                   thresh=0.3, min_kept=64, factor=2)
    assert float(loss_hard) >= float(ce_all)


def test_criterion_ohem_dsn_runs():
    from structure_knowledge_distillation_tpu.losses import criterion_ohem_dsn

    rng = np.random.RandomState(8)
    main = jnp.asarray(rng.randn(2, 9, 9, 5).astype(np.float32))
    aux = jnp.asarray(rng.randn(2, 9, 9, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, (2, 36, 36)))
    loss = criterion_ohem_dsn((main, aux), labels, min_kept=100, thresh=0.5)
    assert np.isfinite(float(loss))


def _ohem_scipy_oracle(logits, labels, thresh, min_kept_full, factor):
    """Literal translation of the reference OhemCrossEntropy2d
    (utils/criterion.py:11-90), including the scipy zoom(order=1)/
    zoom(order=0) downsample; returns the expected kept-mean CE."""
    import scipy.ndimage as nd
    np_predict = np.transpose(
        np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1)), (0, 3, 1, 2)
    ).astype(np.float64)
    np_target = labels.astype(np.float64)
    predict = nd.zoom(np_predict, (1.0, 1.0, 1.0 / factor, 1.0 / factor), order=1)
    target = nd.zoom(np_target, (1.0, 1.0 / factor, 1.0 / factor), order=0)
    min_kept = min_kept_full // (factor * factor)
    input_label = target.ravel().astype(np.int32)
    cc = predict.shape[1]
    input_prob = np.rollaxis(predict, 1).reshape((cc, -1))
    valid_flag = input_label != 255
    label = input_label[valid_flag]
    num_valid = valid_flag.sum()
    if min_kept >= num_valid:
        threshold = 1.0
    else:
        prob = input_prob[:, valid_flag]
        pred = prob[label, np.arange(len(label), dtype=np.int32)]
        threshold = thresh
        if min_kept > 0:
            k_th = min(len(pred), min_kept) - 1
            new_threshold = np.partition(pred, k_th)[k_th]
            if new_threshold > thresh:
                threshold = new_threshold
    # full-res keep mask + mean CE over kept (CrossEntropyLoss ignore_index)
    full_prob = np.transpose(np_predict, (0, 2, 3, 1))
    gt_prob = np.take_along_axis(
        full_prob, np.where(labels != 255, labels, 0)[..., None], axis=-1)[..., 0]
    kept = (labels != 255) & (gt_prob <= threshold)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    ce = -np.take_along_axis(
        logp, np.where(labels != 255, labels, 0)[..., None], axis=-1)[..., 0]
    return ce[kept].mean()


def test_ohem_matches_scipy_zoom_oracle():
    """Threshold search + final loss vs the literal reference translation
    (utils/criterion.py:11-90) at the recipe-shaped config."""
    from structure_knowledge_distillation_tpu.losses import ohem_cross_entropy

    rng = np.random.RandomState(3)
    n, h, w, c = 2, 32, 48, 6
    factor, thresh, min_kept_full = 4, 0.3, 16 * 16  # -> k=16 on the ds grid
    logits = rng.randn(n, h, w, c).astype(np.float32) * 2.0
    labels = rng.randint(0, c, (n, h, w)).astype(np.int32)
    labels[0, :4] = 255  # some ignored rows

    expected = _ohem_scipy_oracle(logits, labels, thresh, min_kept_full, factor)
    got = ohem_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), ignore_index=255,
        thresh=thresh, min_kept=min_kept_full, factor=factor)
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_ohem_randomized_sweep():
    """Seeded random sweep over OHEM configurations (shape, factor,
    threshold, min_kept regimes incl. 0 and larger-than-valid, ignore
    density) vs the scipy oracle."""
    from structure_knowledge_distillation_tpu.losses import ohem_cross_entropy

    rng = np.random.RandomState(11)
    for case in range(10):
        factor = int(rng.choice([2, 4]))
        n = int(rng.randint(1, 3))
        h = factor * int(rng.randint(3, 11))
        w = factor * int(rng.randint(3, 11))
        c = int(rng.randint(2, 8))
        thresh = float(rng.uniform(0.1, 0.9))
        regime = case % 3  # 0: none, 1: moderate, 2: more than valid
        min_kept_full = (0, (h // factor) * (w // factor) * factor * factor // 3,
                         4 * n * h * w)[regime]
        logits = rng.randn(n, h, w, c).astype(np.float32) * 2.0
        labels = rng.randint(0, c, (n, h, w)).astype(np.int32)
        mask = rng.rand(n, h, w) < rng.uniform(0.0, 0.4)
        labels[mask] = 255
        expected = _ohem_scipy_oracle(logits, labels, thresh, min_kept_full,
                                      factor)
        got = ohem_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), ignore_index=255,
            thresh=thresh, min_kept=min_kept_full, factor=factor)
        msg = (f"case {case}: {(n, h, w, c)} factor {factor} thresh "
               f"{thresh:.3f} min_kept {min_kept_full}")
        np.testing.assert_allclose(float(got), expected, rtol=1e-4,
                                   err_msg=msg)


def test_ohem_min_kept_zero_keeps_thresh():
    from structure_knowledge_distillation_tpu.losses import ohem_cross_entropy

    rng = np.random.RandomState(4)
    logits = rng.randn(1, 16, 16, 5).astype(np.float32)
    labels = rng.randint(0, 5, (1, 16, 16)).astype(np.int32)
    # min_kept=0: threshold stays at `thresh` (reference skips the search)
    got = ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                             thresh=0.9, min_kept=0, factor=4)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    gt = np.take_along_axis(probs, labels[..., None], axis=-1)[..., 0]
    kept = gt <= 0.9
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    ce = -np.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(float(got), ce[kept].mean(), rtol=1e-5)
