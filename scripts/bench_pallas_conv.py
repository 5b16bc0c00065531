"""Feasibility probe: 3x3/s1 SAME conv (64ch, 256 res) as a Pallas kernel
(9 shifted MXU matmuls over halo row-blocks) vs XLA's conv.

Decides whether a fused Pallas stem is worth building. Scan-harness fenced
(see bench_reduce.py for why single calls are useless through the relay).

    python scripts/bench_pallas_conv.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BP = 16  # rows per grid step


def _shift_cols(slab, s):
    """Shift (R, W, C) along W with zero fill; out[w] = in[w-s]."""
    if s == 0:
        return slab
    z = jnp.zeros((slab.shape[0], abs(s), slab.shape[2]), slab.dtype)
    if s > 0:
        return jnp.concatenate([z, slab[:, :-s, :]], axis=1)
    return jnp.concatenate([slab[:, -s:, :], z], axis=1)


def _conv_kernel(prev_ref, cur_ref, next_ref, w_ref, out_ref, acc_ref,
                 *, cin: int, cout: int, nblocks: int):
    j = pl.program_id(1)
    bp, w_len = cur_ref.shape[1], cur_ref.shape[2]
    dt = cur_ref.dtype

    top = jnp.where(j > 0, 1, 0).astype(dt)
    bot = jnp.where(j < nblocks - 1, 1, 0).astype(dt)
    prev_last = prev_ref[0, bp - 1:bp] * top
    next_first = next_ref[0, 0:1] * bot
    slab = jnp.concatenate([prev_last, cur_ref[0], next_first], axis=0)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        rows = slab[dy:dy + bp]                      # (BP, W, Cin)
        for dx in range(3):
            shifted = _shift_cols(rows, 1 - dx)
            m2d = shifted.reshape(bp * w_len, cin)
            acc_ref[:] += jax.lax.dot_general(
                m2d, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[0] = acc_ref[:].reshape(bp, w_len, cout).astype(out_ref.dtype)


def pallas_conv3x3(x, w):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    nblocks = h // BP
    kernel = functools.partial(_conv_kernel, cin=cin, cout=cout,
                               nblocks=nblocks)
    x_spec_at = lambda off: pl.BlockSpec(
        (1, BP, wd, cin),
        lambda i, j, off=off: (i, jnp.clip(j + off, 0, nblocks - 1), 0, 0),
        memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(n, nblocks),
        in_specs=[x_spec_at(-1), x_spec_at(0), x_spec_at(1),
                  pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BP, wd, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((BP * wd, cout), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(x, x, x, w)


def xla_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    key = jax.random.PRNGKey(0)
    for cout in (64, 128):
        x = jax.random.normal(key, (8, 256, 256, 64), jnp.bfloat16)
        w = (jax.random.normal(key, (3, 3, 64, cout), jnp.float32) * 0.1
             ).astype(jnp.bfloat16)

        @jax.jit
        def relerr(x, w):
            a = xla_conv3x3(x, w).astype(jnp.float32)
            b = pallas_conv3x3(x, w).astype(jnp.float32)
            return jnp.abs(a - b).max() / jnp.maximum(jnp.abs(a).max(), 1e-6)

        print(f"cout={cout} rel err {float(np.asarray(relerr(x, w))):.2e}",
              flush=True)

        K = 8
        xs = jax.random.normal(key, (K,) + x.shape, jnp.bfloat16)

        def scanned(f):
            @jax.jit
            def run(xs, w):
                def body(acc, xi):
                    return acc + f(xi, w)[0, 0, 0, :].astype(jnp.float32), None
                acc, _ = jax.lax.scan(body, jnp.zeros((cout,), jnp.float32), xs)
                return acc
            return run

        def timeit(fn, *args, steps=5):
            for _ in range(2):
                out = fn(*args)
            float(np.asarray(out).ravel()[0])
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fn(*args)
            float(np.asarray(out).ravel()[0])
            return (time.perf_counter() - t0) / (steps * K) * 1e3

        print(f"  xla    {timeit(scanned(xla_conv3x3), xs, w):7.3f} ms/iter",
              flush=True)
        print(f"  pallas {timeit(scanned(pallas_conv3x3), xs, w):7.3f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
