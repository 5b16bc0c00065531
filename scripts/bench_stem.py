"""Micro-bench: stem conv formulations (the 64-channel 256-res convs run
3-7x above their HBM floor in the full step).

    python scripts/bench_stem.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = 12


def timeit(fn, *args, steps=5):
    for _ in range(2):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / (steps * K) * 1e3


def loop(f):
    @jax.jit
    def run(*args):
        def body(i, acc):
            scaled = args[0] * i.astype(args[0].dtype)
            return jax.tree.map(jnp.add, acc, f(scaled, *args[1:]))
        acc0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                            jax.eval_shape(f, *args))
        return jax.lax.fori_loop(0, K, body, acc0)
    return run


def conv1_direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv1_patches(x, w):
    p = jax.lax.conv_general_dilated_patches(
        x, (3, 3), window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (N,Ho,Wo,27)
    return jax.lax.dot_general(
        p, w.reshape(-1, w.shape[-1]), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def grad_w(conv):
    def f(x, w, dy):
        out, vjp = jax.vjp(lambda w_: conv(x, w_), w)
        (dw,) = vjp(dy)
        return jnp.vdot(out.astype(jnp.float32), dy.astype(jnp.float32)), dw
    return f


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 512, 512, 3), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, 64), jnp.bfloat16)
    dy = jax.random.normal(key, (8, 256, 256, 64), jnp.bfloat16)

    # patches kernel layout note: conv_general_dilated_patches returns
    # channel-major taps (C, kh, kw) on the feature axis; build the matching
    # weight view for numeric comparison
    w_cm = jnp.transpose(w, (2, 0, 1, 3)).reshape(-1, 64)

    def conv1_patches_cm(x, w_full):
        p = jax.lax.conv_general_dilated_patches(
            x, (3, 3), window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        wv = jnp.transpose(w_full, (2, 0, 1, 3)).reshape(-1, w_full.shape[-1])
        return jax.lax.dot_general(
            p, wv, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)

    a = np.asarray(conv1_direct(x, w), np.float32)
    b = np.asarray(conv1_patches_cm(x, w), np.float32)
    print("max abs diff direct vs patches:", np.abs(a - b).max())

    print(f"conv1 fwd direct  : {timeit(loop(lambda x: conv1_direct(x, w)), x):7.3f} ms/iter")
    print(f"conv1 fwd patches : {timeit(loop(lambda x: conv1_patches_cm(x, w)), x):7.3f} ms/iter")
    print(f"conv1 fwd+dw direct : {timeit(loop(lambda x: grad_w(conv1_direct)(x, w, dy)), x):7.3f} ms/iter")
    print(f"conv1 fwd+dw patches: {timeit(loop(lambda x: grad_w(conv1_patches_cm)(x, w, dy)), x):7.3f} ms/iter")

    # conv2: 64->64 at 256 res
    x2 = jax.random.normal(key, (8, 256, 256, 64), jnp.bfloat16)
    w2 = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16)
    dy2 = jax.random.normal(key, (8, 256, 256, 64), jnp.bfloat16)

    def conv2_direct(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def grad_xw(conv):
        def f(x, w, dy):
            out, vjp = jax.vjp(conv, x, w)
            dx, dw = vjp(dy)
            return (jnp.vdot(out.astype(jnp.float32), dy.astype(jnp.float32)),
                    dx[0, 0, 0, :].astype(jnp.float32), dw)
        return f

    print(f"conv2 fwd direct  : {timeit(loop(lambda x: conv2_direct(x, w2)), x2):7.3f} ms/iter")
    print(f"conv2 fwd+bwd direct: {timeit(loop(lambda x: grad_xw(conv2_direct)(x, w2, dy2)), x2):7.3f} ms/iter")


if __name__ == "__main__":
    main()
