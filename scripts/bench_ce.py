"""Micro-bench: dual-head (DSN) upsampled-CE fwd+bwd at the flagship shape
(batch 8, 65x65x19 logits -> 512x512 labels), fenced with a value fetch.

    python scripts/bench_ce.py [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from structure_knowledge_distillation_tpu.ops.pallas_ce import (
        upsampled_ce_loss_dsn,
    )

    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (8, 65, 65, 19), jnp.bfloat16)
    aux = jax.random.normal(jax.random.PRNGKey(1), (8, 65, 65, 19), jnp.bfloat16)
    labels = jax.random.randint(key, (8, 512, 512), 0, 19)

    @jax.jit
    def fwd_bwd(logits, aux, labels):
        def f(l, a):
            return upsampled_ce_loss_dsn(l, a, labels, (512, 512), 255, 0.4)
        loss, grads = jax.value_and_grad(f, argnums=(0, 1))(logits, aux)
        return loss, grads[0].sum(), grads[1].sum()

    for _ in range(3):
        out = fwd_bwd(logits, aux, labels)
    float(np.asarray(out[0]))

    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd_bwd(logits, aux, labels)
    v = float(np.asarray(out[0]))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    print(f"dual CE fwd+bwd: {1e3 * dt / steps:.3f} ms/call "
          f"({1e3 * dt / steps / 8:.3f} ms/img), loss={v:.4f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", default=20, type=int)
    main(p.parse_args().steps)
