"""Fenced micro-bench: stem ceil-maxpool (3×3/s2/p1) forward+backward at the
flagship shapes — the `select_and_scatter` backward is ROADMAP backlog #2.

Scanned-loop fencing per the repo measurement discipline (single dispatches
through the relay pay ~2.2 ms; xplane durations in scanned programs are
unusable — wall-clock a K-iteration scan and subtract the trivial-body cost).

    python scripts/bench_pool.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fenced_scan_ms(fn, args, k=50):
    """Wall ms per iteration of lax.scan(fn) over k dummy steps."""

    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*c)
            # fold output back into the carry so iterations are sequential
            new_first = c[0] + 0.0 * jnp.sum(out).astype(c[0].dtype)
            return (new_first,) + c[1:], ()

        c, _ = jax.lax.scan(body, args, None, length=k)
        return jnp.sum(c[0])

    float(np.asarray(run(args)))  # compile + warm
    t0 = time.perf_counter()
    v = float(np.asarray(run(args)))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    return dt / k * 1000.0


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/sskd_jax_cache")
    except Exception:
        pass
    from structure_knowledge_distillation_tpu.ops.pooling import max_pool_2d

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 256, 256, 128), jnp.bfloat16)
    dy_shape = jax.eval_shape(
        lambda a: max_pool_2d(a, (3, 3), (2, 2), (1, 1), True), x)
    dy = jax.random.normal(key, dy_shape.shape, jnp.bfloat16)

    def fwd(x, dy):
        return max_pool_2d(x, (3, 3), (2, 2), (1, 1), ceil_mode=True)

    def fwdbwd(x, dy):
        y, vjp = jax.vjp(
            lambda a: max_pool_2d(a, (3, 3), (2, 2), (1, 1), True), x)
        (dx,) = vjp(dy)
        return dx

    def trivial(x, dy):
        return x * 1.0001

    base = fenced_scan_ms(trivial, (x, dy))
    f = fenced_scan_ms(fwd, (x, dy))
    fb = fenced_scan_ms(fwdbwd, (x, dy))
    print(json.dumps({
        "metric": "stem_maxpool_ms",
        "trivial_body": round(base, 3),
        "fwd": round(f - base, 3),
        "fwd_plus_bwd": round(fb - base, 3),
        "bwd_alone": round(fb - f, 3),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
