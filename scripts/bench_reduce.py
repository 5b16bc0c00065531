"""Micro-bench: per-channel reduction formulations at BN-layer shapes.

The full-step profile attributes ~14 ms/step to f32[C] convert_reduce
fusions (the ABN statistic/gradient sums). This measures the standalone
device cost of candidate formulations. The ~2.2 ms axon dispatch floor
makes single-call timing useless, so each formulation is scanned over K
distinct inputs INSIDE one jit and the per-iteration cost is reported.

    python scripts/bench_reduce.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = 24


def timeit(fn, *args, steps=5):
    out = None
    for _ in range(2):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / (steps * K) * 1e3


def main():
    key = jax.random.PRNGKey(0)
    for shape in [(8, 65, 65, 512), (8, 256, 256, 64), (8, 128, 128, 128)]:
        c = shape[-1]
        xs = jax.random.normal(key, (K,) + shape, jnp.bfloat16)
        nbytes = int(np.prod(shape)) * 2

        def scanned(one):
            @jax.jit
            def run(xs):
                def body(acc, x):
                    return jax.tree.map(jnp.add, acc, one(x)), None
                acc0 = jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype),
                    jax.eval_shape(one, xs[0]))
                acc, _ = jax.lax.scan(body, acc0, xs)
                return acc
            return run

        def plain_sum(x):
            return jnp.sum(x.astype(jnp.float32), axis=(0, 1, 2))

        def both_moments(x):
            xf = x.astype(jnp.float32)
            return jnp.sum(xf, (0, 1, 2)), jnp.sum(xf * xf, (0, 1, 2))

        def ones_dot(x):
            x2d = x.reshape(-1, c)
            ones = jnp.ones((x2d.shape[0],), x.dtype)
            return jax.lax.dot_general(
                ones, x2d, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def ones_mat_dot(x):
            x2d = x.reshape(-1, c)
            ones = jnp.ones((8, x2d.shape[0]), x.dtype)
            r = jax.lax.dot_general(
                ones, x2d, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return r[0]

        def both_moments_dot(x):
            x2d = x.reshape(-1, c)
            x_cat = jnp.concatenate([x2d, x2d * x2d], axis=-1)
            ones = jnp.ones((8, x2d.shape[0]), x.dtype)
            r = jax.lax.dot_general(
                ones, x_cat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return r[0, :c], r[0, c:]

        def batch_partial(x):
            # reduce H,W per batch row first (keeps 8×C), then fold batch
            xf = x.astype(jnp.float32)
            p = jnp.sum(xf, axis=(1, 2))
            return jnp.sum(p, axis=0)

        print(f"shape {shape} ({nbytes/1e6:.1f} MB, floor "
              f"{nbytes/820e9*1e3:.3f} ms @820GB/s)", flush=True)
        for name, fn in [("plain_sum", plain_sum),
                         ("both_moments", both_moments),
                         ("ones_dot", ones_dot),
                         ("ones_mat_dot", ones_mat_dot),
                         ("both_moments_dot", both_moments_dot),
                         ("batch_partial", batch_partial)]:
            print(f"  {name:18s} {timeit(scanned(fn), xs):7.3f} ms/iter",
                  flush=True)


if __name__ == "__main__":
    main()
