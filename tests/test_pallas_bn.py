"""Pallas fused ABN vs. the pure-XLA reference path: values and gradients.

On CPU the kernels run in interpreter mode; the same code compiles with
Mosaic on TPU. The pure composite (stats -> normalize -> |gamma| affine ->
activation) differentiated by jax autograd is the oracle for the custom VJP —
the same check the reference could only do on GPU hardware against bn.cu.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structure_knowledge_distillation_tpu.ops.pallas_bn import (
    abn_fused_eval,
    abn_fused_train,
)

EPS = 1e-5


def pure_abn_train(x, w, b, activation="leaky_relu", slope=0.01):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(0, 1, 2))
    var = jnp.maximum((xf ** 2).mean(axis=(0, 1, 2)) - mean ** 2, 0.0)
    gamma = jnp.abs(w) + EPS
    y = (xf - mean) * jax.lax.rsqrt(var + EPS)
    z = y * gamma + b
    if activation == "leaky_relu":
        z = jnp.where(z >= 0, z, z * slope)
    elif activation == "elu":
        z = jnp.where(z >= 0, z, jnp.expm1(z))
    return z, mean, var


@pytest.mark.parametrize("activation", ["none", "leaky_relu", "elu"])
def test_fused_forward_matches_pure(activation):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32).astype(np.float32))
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    z, mean, var = abn_fused_train(x, w, b, EPS, activation, 0.01, True, None)
    z_ref, mean_ref, var_ref = pure_abn_train(x, w, b, activation)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("activation", ["none", "leaky_relu", "elu"])
def test_fused_backward_matches_autograd(activation):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 8, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(16) * 0.5 + 1.0).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    ct = jnp.asarray(rng.randn(2, 4, 8, 16).astype(np.float32))

    def fused_loss(x, w, b):
        z, _, _ = abn_fused_train(x, w, b, EPS, activation, 0.01, True, None)
        return jnp.sum(z * ct)

    def pure_loss(x, w, b):
        z, _, _ = pure_abn_train(x, w, b, activation)
        return jnp.sum(z * ct)

    gx, gw, gb = jax.grad(fused_loss, argnums=(0, 1, 2))(x, w, b)
    gx_r, gw_r, gb_r = jax.grad(pure_loss, argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r), rtol=1e-4, atol=1e-4)


def test_fused_eval_matches_pure():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    mean = jnp.asarray(rng.randn(8).astype(np.float32))
    var = jnp.asarray((rng.rand(8) + 0.5).astype(np.float32))
    z = abn_fused_eval(x, w, b, mean, var, EPS, "leaky_relu", 0.01, True)
    gamma = jnp.abs(w) + EPS
    y = (x - mean) * jax.lax.rsqrt(var + EPS)
    z_ref = y * gamma + b
    z_ref = jnp.where(z_ref >= 0, z_ref, z_ref * 0.01)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), rtol=1e-5, atol=1e-5)


def test_fused_sync_matches_global():
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 4, 4, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    ct = jnp.asarray(rng.randn(8, 4, 4, 8).astype(np.float32))

    z_ref, mean_ref, _ = abn_fused_train(x, w, b, EPS, "leaky_relu", 0.01, True, None)
    gx_ref = jax.grad(
        lambda x: jnp.sum(abn_fused_train(x, w, b, EPS, "leaky_relu", 0.01, True, None)[0] * ct)
    )(x)

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    def shard_fn(xs, cts):
        z, mean, var = abn_fused_train(xs, w, b, EPS, "leaky_relu", 0.01, True, "data")
        gx = jax.grad(
            lambda x: jnp.sum(
                abn_fused_train(x, w, b, EPS, "leaky_relu", 0.01, True, "data")[0] * cts
            )
        )(xs)
        return z, mean, gx

    z, mean, gx = shard_map(
        shard_fn, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P(), P("data")), check_vma=False,
    )(x, ct)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)


def test_module_fused_flag_matches_xla_path():
    from structure_knowledge_distillation_tpu.ops import ABN

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    ref_mod = ABN(activation="leaky_relu")
    fused_mod = ABN(activation="leaky_relu", fused=True)
    variables = ref_mod.init(jax.random.PRNGKey(0), x, use_running_average=False)
    variables = {
        "params": {
            "weight": jnp.asarray(rng.randn(16).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(16).astype(np.float32)),
        },
        "batch_stats": variables["batch_stats"],
    }
    y_ref, st_ref = ref_mod.apply(variables, x, use_running_average=False,
                                  mutable=["batch_stats"])
    y_fused, st_fused = fused_mod.apply(variables, x, use_running_average=False,
                                        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(st_fused), jax.tree.leaves(st_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    # eval path too
    y_e1 = ref_mod.apply({"params": variables["params"],
                          "batch_stats": st_ref["batch_stats"]}, x,
                         use_running_average=True)
    y_e2 = fused_mod.apply({"params": variables["params"],
                            "batch_stats": st_fused["batch_stats"]}, x,
                           use_running_average=True)
    np.testing.assert_allclose(np.asarray(y_e2), np.asarray(y_e1), rtol=1e-5, atol=1e-5)
