"""Teacher-forward microbench: R101 PSPNet eval fwd, batch 8, 512², bf16.

Times the frozen-teacher inference path in isolation (the biggest single
piece of the train step — reference kd_model.py:121-122) with and without
eval-mode BN folding. Value-fetch fencing (block_until_ready does not force
execution on the axon relay).

    python scripts/bench_teacher.py [--fold {0,1,both}] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(fold: bool, batch: int, size: int):
    from structure_knowledge_distillation_tpu.models import (
        ResPSPNet, fold_bn_variables,
    )

    model = ResPSPNet(block="bottleneck", layers=(3, 4, 23, 3), num_classes=19,
                      dtype=jnp.bfloat16, fold_bn=fold)
    base = ResPSPNet(block="bottleneck", layers=(3, 4, 23, 3), num_classes=19,
                     dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: base.init(key, x[:1], train=False))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    variables["batch_stats"] = jax.tree.map(jnp.ones_like, variables["batch_stats"])
    variables["params"] = jax.tree.map(
        lambda a: a + 0.01 if a.ndim == 4 else a + 0.5, variables["params"])
    if fold:
        variables = fold_bn_variables(jax.device_get(variables))
        variables = jax.tree.map(jnp.asarray, variables)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)[0]

    return fwd, variables, x


def run(fold: bool, batch: int, size: int, warmup: int = 3, steps: int = 20):
    fwd, variables, x = build(fold, batch, size)
    for _ in range(warmup):
        out = fwd(variables, x)
    float(np.asarray(out).ravel()[0])  # fence
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(variables, x)
    float(np.asarray(out).ravel()[0])  # fence
    dt = time.perf_counter() - t0
    ms_per_img = dt / (steps * batch) * 1e3
    print(f"fold={int(fold)}: {ms_per_img:.3f} ms/img "
          f"({steps * batch / dt:.1f} img/s)")
    return ms_per_img



def run_depth_sweep(batch: int = 8, size: int = 512, steps: int = 20):
    """Subtractive stage timing: vary one stage's depth, difference gives the
    per-block cost of that stage (localizes the roofline gap)."""
    from structure_knowledge_distillation_tpu.models import ResPSPNet

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    results = {}
    variants = {
        "full_3_4_23_3": (3, 4, 23, 3),
        "l3_minus8_3_4_15_3": (3, 4, 15, 3),
        "l4_minus2_3_4_23_1": (3, 4, 23, 1),
        "l2_minus3_3_1_23_3": (3, 1, 23, 3),
    }
    for name, layers in variants.items():
        model = ResPSPNet(block="bottleneck", layers=layers, num_classes=19,
                          dtype=jnp.bfloat16)
        shapes = jax.eval_shape(lambda m=model: m.init(key, x[:1], train=False))
        v = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        v["batch_stats"] = jax.tree.map(jnp.ones_like, v["batch_stats"])
        v["params"] = jax.tree.map(
            lambda a: a + 0.01 if a.ndim == 4 else a + 0.5, v["params"])
        fwd = jax.jit(lambda vv, xx, m=model: m.apply(vv, xx, train=False)[0])
        for _ in range(3):
            out = fwd(v, x)
        float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fwd(v, x)
        float(np.asarray(out).ravel()[0])
        dt = time.perf_counter() - t0
        ms = dt / (steps * batch) * 1e3
        results[name] = ms
        print(f"{name}: {ms:.3f} ms/img")
    full = results["full_3_4_23_3"]
    print(f"per-l3-block: {(full - results['l3_minus8_3_4_15_3']) / 8:.4f} ms/img")
    print(f"per-l4-block: {(full - results['l4_minus2_3_4_23_1']) / 2:.4f} ms/img")
    print(f"per-l2-block: {(full - results['l2_minus3_3_1_23_3']) / 3:.4f} ms/img")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--fold", default="both", choices=("0", "1", "both"))
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--size", default=512, type=int)
    p.add_argument("--steps", default=20, type=int)
    p.add_argument("--sweep", action="store_true",
                   help="subtractive per-stage depth sweep instead")
    a = p.parse_args()
    if a.sweep:
        run_depth_sweep(a.batch, a.size, a.steps)
    else:
        if a.fold in ("0", "both"):
            run(False, a.batch, a.size, steps=a.steps)
        if a.fold in ("1", "both"):
            run(True, a.batch, a.size, steps=a.steps)
