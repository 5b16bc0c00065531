"""Parity tests for core ops against torch CPU (the semantics oracle).

The reference's numerics hinge on align_corners=True bilinear resize,
ceil-mode max pooling, torch adaptive average pooling, and ABN batch norm
(gamma = |w| + eps). Each op here is checked against the literal torch
behavior on random inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from structure_knowledge_distillation_tpu.ops import (
    ABN,
    BatchNorm2d,
    adaptive_avg_pool_2d,
    max_pool_2d,
    resize_bilinear_align_corners,
)


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def to_nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return np.transpose(x_nchw.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize(
    "in_size,out_size",
    [((65, 65), (512, 512)), ((8, 8), (64, 64)), ((129, 257), (64, 128)),
     ((1, 1), (13, 13)), ((7, 9), (7, 9)), ((33, 17), (1, 1))],
)
def test_resize_align_corners_matches_torch(in_size, out_size):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_size, 5).astype(np.float32)
    ours = resize_bilinear_align_corners(jnp.asarray(x), out_size)
    theirs = F.interpolate(nchw(x), size=out_size, mode="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize(
    "hw,kernel,stride,pad,ceil",
    [
        ((256, 256), (3, 3), (2, 2), (1, 1), True),   # ResNet stem: 256 -> 129
        ((512, 1024), (3, 3), (2, 2), (1, 1), True),  # eval-res stem
        ((65, 65), (32, 32), (32, 32), (0, 0), True),  # pairwise-loss pool -> 3x3
        ((64, 64), (32, 32), (32, 32), (0, 0), True),  # even case -> 2x2
        ((17, 23), (3, 2), (2, 3), (1, 0), True),
        ((17, 23), (3, 2), (2, 3), (1, 0), False),
    ],
)
def test_max_pool_matches_torch(hw, kernel, stride, pad, ceil):
    rng = np.random.RandomState(1)
    x = rng.randn(2, *hw, 3).astype(np.float32)
    ours = max_pool_2d(jnp.asarray(x), kernel, stride, pad, ceil_mode=ceil)
    theirs = F.max_pool2d(nchw(x), kernel, stride, pad, ceil_mode=ceil)
    assert ours.shape[1:3] == theirs.shape[2:4], (ours.shape, theirs.shape)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "hw,kernel,stride,pad,ceil",
    [
        ((65, 65), (32, 32), (32, 32), (0, 0), True),  # pairwise pool (tiled)
        ((64, 64), (32, 32), (32, 32), (0, 0), True),  # even tiled case
        ((17, 23), (3, 3), (3, 3), (1, 1), True),      # tiled with padding
        ((17, 23), (4, 3), (4, 3), (0, 0), False),     # floor: input tail cropped
        ((33, 33), (3, 3), (2, 2), (1, 1), True),      # overlapping (reduce_window)
    ],
)
def test_max_pool_grad_matches_torch(hw, kernel, stride, pad, ceil):
    """Backward parity incl. tie ROUTING: integer-valued inputs make near-every
    window tie, so this fails unless gradients go to torch's first-max tap
    (the tiled k==s path's custom VJP and the select_and_scatter path both)."""
    rng = np.random.RandomState(7)
    x = rng.randint(0, 3, size=(2, *hw, 3)).astype(np.float32)
    dy_shape = max_pool_2d(jnp.asarray(x), kernel, stride, pad,
                           ceil_mode=ceil).shape
    dy = rng.randn(*dy_shape).astype(np.float32)

    def f(xx):
        y = max_pool_2d(xx, kernel, stride, pad, ceil_mode=ceil)
        return jnp.sum(y * jnp.asarray(dy))

    ours = jax.grad(f)(jnp.asarray(x))

    xt = nchw(x).requires_grad_(True)
    yt = F.max_pool2d(xt, kernel, stride, pad, ceil_mode=ceil)
    yt.backward(torch.from_numpy(np.transpose(dy, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(xt.grad),
                               rtol=1e-6, atol=1e-6)


def test_max_pool_grad_randomized_sweep():
    """Random-shape tie-saturated grad parity, biased to kernel==stride so the
    tiled custom-VJP path gets broad coverage (floor/ceil, padding, crops)."""
    rng = np.random.RandomState(4321)
    for i in range(12):
        ih, iw = int(rng.randint(4, 30)), int(rng.randint(4, 30))
        kh, kw = int(rng.randint(1, 6)), int(rng.randint(1, 6))
        if i % 3 != 0:  # mostly non-overlapping (the new path)
            sh, sw = kh, kw
        else:
            sh, sw = int(rng.randint(1, 5)), int(rng.randint(1, 5))
        ph, pw = int(rng.randint(0, kh // 2 + 1)), int(rng.randint(0, kw // 2 + 1))
        ceil = bool(rng.randint(0, 2))
        x = rng.randint(0, 3, size=(2, ih, iw, 3)).astype(np.float32)
        try:
            yt_shape = F.max_pool2d(torch.zeros(1, 1, ih, iw), (kh, kw),
                                    (sh, sw), (ph, pw), ceil_mode=ceil).shape
        except RuntimeError:
            continue  # torch rejects this config (e.g. pad > kernel/2)
        dy = rng.randn(2, *yt_shape[2:], 3).astype(np.float32)

        def f(xx):
            y = max_pool_2d(xx, (kh, kw), (sh, sw), (ph, pw), ceil_mode=ceil)
            return jnp.sum(y * jnp.asarray(dy))

        ours = jax.grad(f)(jnp.asarray(x))
        xt = nchw(x).requires_grad_(True)
        yt = F.max_pool2d(xt, (kh, kw), (sh, sw), (ph, pw), ceil_mode=ceil)
        yt.backward(torch.from_numpy(np.transpose(dy, (0, 3, 1, 2))))
        msg = f"grad pool {(ih, iw)} k{(kh, kw)} s{(sh, sw)} p{(ph, pw)} ceil={ceil}"
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(xt.grad),
                                   rtol=1e-6, atol=1e-6, err_msg=msg)


@pytest.mark.parametrize("hw,out", [((65, 65), (6, 6)), ((65, 65), (1, 1)),
                                    ((64, 64), (3, 3)), ((129, 257), (2, 5))])
def test_adaptive_avg_pool_matches_torch(hw, out):
    rng = np.random.RandomState(2)
    x = rng.randn(2, *hw, 4).astype(np.float32)
    ours = adaptive_avg_pool_2d(jnp.asarray(x), out)
    theirs = F.adaptive_avg_pool2d(nchw(x), out)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=1e-5, atol=1e-5)


def test_op_parity_randomized_sweep():
    """Seeded random-shape sweep of the three resize/pool primitives vs
    torch — the hand-picked cases above pin the recipe's shapes; this guards
    the rest of the configuration space (odd sizes, up/down mixes, kernels
    larger than the input, uneven adaptive bins)."""
    rng = np.random.RandomState(1234)
    for _ in range(24):
        ih, iw = int(rng.randint(1, 40)), int(rng.randint(1, 40))
        oh, ow = int(rng.randint(1, 40)), int(rng.randint(1, 40))
        c = int(rng.randint(1, 5))
        x = rng.randn(2, ih, iw, c).astype(np.float32)
        ours = resize_bilinear_align_corners(jnp.asarray(x), (oh, ow))
        theirs = F.interpolate(nchw(x), size=(oh, ow), mode="bilinear",
                               align_corners=True)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"resize {(ih, iw)}->{(oh, ow)}")

        aoh, aow = int(rng.randint(1, ih + 1)), int(rng.randint(1, iw + 1))
        ours = adaptive_avg_pool_2d(jnp.asarray(x), (aoh, aow))
        theirs = F.adaptive_avg_pool2d(nchw(x), (aoh, aow))
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"adaptive {(ih, iw)}->{(aoh, aow)}")

    for _ in range(24):
        ih, iw = int(rng.randint(4, 40)), int(rng.randint(4, 40))
        kh, kw = int(rng.randint(1, 6)), int(rng.randint(1, 6))
        sh, sw = int(rng.randint(1, 5)), int(rng.randint(1, 5))
        ph, pw = int(rng.randint(0, kh // 2 + 1)), int(rng.randint(0, kw // 2 + 1))
        ceil = bool(rng.randint(0, 2))
        x = rng.randn(2, ih, iw, 3).astype(np.float32)
        ours = max_pool_2d(jnp.asarray(x), (kh, kw), (sh, sw), (ph, pw),
                           ceil_mode=ceil)
        theirs = F.max_pool2d(nchw(x), (kh, kw), (sh, sw), (ph, pw),
                              ceil_mode=ceil)
        msg = f"pool {(ih, iw)} k{(kh, kw)} s{(sh, sw)} p{(ph, pw)} ceil={ceil}"
        assert ours.shape[1:3] == theirs.shape[2:4], msg
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   rtol=1e-6, atol=1e-6, err_msg=msg)


class _TorchABN(torch.nn.Module):
    """Literal translation of the reference ABN semantics for the oracle:
    gamma = |weight| + eps (reference: libs/src/bn.cu:153), then activation."""

    def __init__(self, c, eps=1e-5, momentum=0.1, activation="none", slope=0.01):
        super().__init__()
        self.weight = torch.nn.Parameter(torch.randn(c))
        self.bias = torch.nn.Parameter(torch.randn(c))
        self.register_buffer("running_mean", torch.zeros(c))
        self.register_buffer("running_var", torch.ones(c))
        self.eps, self.momentum, self.activation, self.slope = eps, momentum, activation, slope

    def forward(self, x, training=True):
        if training:
            mean = x.mean(dim=(0, 2, 3))
            var = x.var(dim=(0, 2, 3), unbiased=False)
            n = x.numel() / x.shape[1]
            with torch.no_grad():
                self.running_mean.mul_(1 - self.momentum).add_(self.momentum * mean)
                self.running_var.mul_(1 - self.momentum).add_(
                    self.momentum * var * n / (n - 1)
                )
        else:
            mean, var = self.running_mean, self.running_var
        gamma = self.weight.abs() + self.eps
        y = (x - mean[None, :, None, None]) / torch.sqrt(var[None, :, None, None] + self.eps)
        y = y * gamma[None, :, None, None] + self.bias[None, :, None, None]
        if self.activation == "leaky_relu":
            y = F.leaky_relu(y, self.slope)
        return y


@pytest.mark.parametrize("activation", ["none", "leaky_relu"])
def test_abn_train_matches_reference_semantics(activation):
    rng = np.random.RandomState(3)
    c = 6
    x = rng.randn(4, 8, 8, c).astype(np.float32)
    oracle = _TorchABN(c, activation=activation)
    weight = oracle.weight.detach().numpy()
    bias = oracle.bias.detach().numpy()

    mod = ABN(activation=activation)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)
    variables = {
        "params": {"weight": jnp.asarray(weight), "bias": jnp.asarray(bias)},
        "batch_stats": variables["batch_stats"],
    }
    y, new_state = mod.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    y_t = oracle(nchw(x), training=True)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_t), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["mean"]),
        oracle.running_mean.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["var"]),
        oracle.running_var.numpy(), rtol=1e-5, atol=1e-6,
    )

    # eval mode uses the running statistics
    y_eval = mod.apply(
        {"params": variables["params"], "batch_stats": new_state["batch_stats"]},
        jnp.asarray(x), use_running_average=True,
    )
    y_eval_t = oracle(nchw(x), training=False)
    np.testing.assert_allclose(np.asarray(y_eval), to_nhwc(y_eval_t), rtol=1e-4, atol=1e-4)


def test_plain_batchnorm_matches_torch():
    rng = np.random.RandomState(4)
    c = 19
    x = rng.randn(2, 16, 16, c).astype(np.float32)
    torch_bn = torch.nn.BatchNorm2d(c)
    torch_bn.weight.data = torch.randn(c)
    torch_bn.bias.data = torch.randn(c)
    torch_bn.train()
    y_t = torch_bn(nchw(x))

    mod = BatchNorm2d()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)
    variables = {
        "params": {
            "weight": jnp.asarray(torch_bn.weight.detach().numpy()),
            "bias": jnp.asarray(torch_bn.bias.detach().numpy()),
        },
        "batch_stats": variables["batch_stats"],
    }
    y, new_state = mod.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_t), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["var"]),
        torch_bn.running_var.detach().numpy(), rtol=1e-5, atol=1e-6,
    )


def test_sync_bn_matches_global_batch():
    """Per-shard pmean statistics == full-batch statistics (the invariant the
    reference's InPlaceABNSync queue protocol existed to preserve)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    rng = np.random.RandomState(5)
    c = 4
    x = rng.randn(16, 4, 4, c).astype(np.float32)

    mod_sync = ABN(activation="leaky_relu", axis_name="data")
    mod_ref = ABN(activation="leaky_relu")
    variables = mod_ref.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)

    y_ref, state_ref = mod_ref.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )

    def per_shard(xs):
        y, st = mod_sync.apply(
            variables, xs, use_running_average=False, mutable=["batch_stats"]
        )
        return y, st["batch_stats"]["mean"], st["batch_stats"]["var"]

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=P("data"), out_specs=(P("data"), P(), P()),
        check_vma=False,
    )
    y_sync, mean_sync, var_sync = sharded(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_sync), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mean_sync), np.asarray(state_ref["batch_stats"]["mean"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(var_sync), np.asarray(state_ref["batch_stats"]["var"]),
        rtol=1e-3, atol=1e-5,
    )


def test_adaptive_pool_bf16_path_close_to_f32():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 65, 65, 32).astype(np.float32)
    from structure_knowledge_distillation_tpu.ops import adaptive_avg_pool_2d

    for bins in (1, 2, 3, 6):
        exact = adaptive_avg_pool_2d(jnp.asarray(x), (bins, bins))
        fast = adaptive_avg_pool_2d(jnp.asarray(x, jnp.bfloat16), (bins, bins))
        np.testing.assert_allclose(np.asarray(fast, np.float32),
                                   np.asarray(exact), rtol=2e-2, atol=2e-2)


def test_abn_train_custom_vjp_matches_autodiff():
    """abn_train (analytic bn.cu backward, MXU reductions) == autodiff of the
    inline formulation, for every activation and both gamma conventions."""
    from structure_knowledge_distillation_tpu.ops.batch_norm import (
        _apply_activation, abn_train,
    )

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 5, 7, 6).astype(np.float32) * 2.0)
    w = jnp.asarray(rng.randn(6).astype(np.float32))
    b = jnp.asarray(rng.randn(6).astype(np.float32))
    dz = jnp.asarray(rng.randn(2, 5, 7, 6).astype(np.float32))
    eps = 1e-5

    def inline(x, w, b, activation, slope, abs_gamma):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.maximum(jnp.mean(jnp.square(xf), axis=(0, 1, 2))
                          - jnp.square(mean), 0.0)
        gamma = jnp.abs(w) + eps if abs_gamma else w
        h = (xf - mean) * jax.lax.rsqrt(var + eps) * gamma + b
        return _apply_activation(h, activation, slope)

    for activation in ("none", "leaky_relu", "elu"):
        for abs_gamma in (True, False):
            def loss_custom(x, w, b):
                z, _, _ = abn_train(x, w, b, eps, activation, 0.01,
                                    abs_gamma, None)
                return jnp.sum(z * dz)

            def loss_inline(x, w, b):
                return jnp.sum(inline(x, w, b, activation, 0.01, abs_gamma) * dz)

            g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(x, w, b)
            g2 = jax.grad(loss_inline, argnums=(0, 1, 2))(x, w, b)
            # fwd values too
            z1, m1, v1 = abn_train(x, w, b, eps, activation, 0.01, abs_gamma, None)
            np.testing.assert_allclose(
                np.asarray(z1), np.asarray(inline(x, w, b, activation, 0.01,
                                                  abs_gamma)),
                rtol=1e-5, atol=1e-5)
            for i, (a, c) in enumerate(zip(g1, g2)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4,
                    err_msg=f"{activation} abs_gamma={abs_gamma} arg{i}")


def test_abn_vjp_randomized_sweep():
    """Randomized shape/scale sweep of the abn_train custom VJP vs autodiff.

    The fixed-shape test pins one (2,5,7,6) case; this varies channel counts
    across the sublane boundary, non-centered/anisotropic inputs (per-channel
    scale up to 30x, offsets up to +-5 — stressing the var = E[x^2]-E[x]^2
    cancellation the analytic backward depends on), slopes, and eps."""
    from structure_knowledge_distillation_tpu.ops.batch_norm import (
        _apply_activation, abn_train,
    )

    rng = np.random.RandomState(99)
    acts = ("none", "leaky_relu", "elu")
    for trial in range(8):
        n = int(rng.randint(1, 4))
        h = int(rng.randint(2, 9))
        w_ = int(rng.randint(2, 9))
        c = int(rng.choice([1, 3, 8, 17, 32, 64]))
        scale = rng.uniform(0.1, 30.0, size=c).astype(np.float32)
        offset = rng.uniform(-5.0, 5.0, size=c).astype(np.float32)
        x = jnp.asarray(rng.randn(n, h, w_, c).astype(np.float32) * scale
                        + offset)
        wt = jnp.asarray(rng.randn(c).astype(np.float32))
        b = jnp.asarray(rng.randn(c).astype(np.float32))
        dz = jnp.asarray(rng.randn(n, h, w_, c).astype(np.float32))
        eps = float(rng.choice([1e-5, 1e-3]))
        slope = float(rng.choice([0.01, 0.2]))
        activation = acts[trial % 3]
        abs_gamma = bool(trial % 2)
        msg = (f"trial {trial}: shape=({n},{h},{w_},{c}) act={activation} "
               f"abs_gamma={abs_gamma} eps={eps} slope={slope}")

        def inline(x, w, b):
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.maximum(jnp.mean(jnp.square(xf), axis=(0, 1, 2))
                              - jnp.square(mean), 0.0)
            gamma = jnp.abs(w) + eps if abs_gamma else w
            hh = (xf - mean) * jax.lax.rsqrt(var + eps) * gamma + b
            return _apply_activation(hh, activation, slope)

        z1, _, _ = abn_train(x, wt, b, eps, activation, slope, abs_gamma, None)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(inline(x, wt, b)),
                                   rtol=1e-4, atol=1e-4, err_msg=msg)
        g1 = jax.grad(lambda x, w, b: jnp.sum(
            abn_train(x, w, b, eps, activation, slope, abs_gamma, None)[0] * dz),
            argnums=(0, 1, 2))(x, wt, b)
        g2 = jax.grad(lambda x, w, b: jnp.sum(inline(x, w, b) * dz),
                      argnums=(0, 1, 2))(x, wt, b)
        for i, (a, c_) in enumerate(zip(g1, g2)):
            ref = np.asarray(c_)
            tol = 1e-3 * max(1.0, float(np.abs(ref).max()))
            np.testing.assert_allclose(np.asarray(a), ref, rtol=2e-3,
                                       atol=tol, err_msg=f"{msg} arg{i}")
