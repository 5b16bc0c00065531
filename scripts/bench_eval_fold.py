"""Fenced probe: folded-BN student inside the fast val path vs standard.

The full-res val forward dominates the sweep (28 of 30.5 ms/img, ROADMAP
round-2), and eval-mode BN folding measured NEUTRAL on the *teacher*
standalone forward (round 2: 3.96 vs 4.00 ms/img — XLA already fuses eval
BN into conv epilogues). This measures the open variant: the R18 *student*
under `make_fast_val_fn`'s fused forward+upsample+argmax+confusion program
(training/evaluate.py:129), with `ResPSPNet(fold_bn=True)` +
`fold_bn_variables` (models/fold.py) vs the standard eval BN.

    python scripts/bench_eval_fold.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from structure_knowledge_distillation_tpu.models import ResPSPNet
    from structure_knowledge_distillation_tpu.models.fold import (
        fold_bn_variables,
    )
    from structure_knowledge_distillation_tpu.training.evaluate import (
        make_fast_val_fn,
    )

    key = jax.random.PRNGKey(0)
    out_size = (1024, 2048)
    image = jax.random.normal(key, (1, *out_size, 3), jnp.float32)
    label = np.asarray(
        jax.random.randint(key, out_size, 0, 19), np.int32)

    base = ResPSPNet(block="basic", layers=(2, 2, 2, 2), num_classes=19,
                     dtype=jnp.bfloat16)
    # real random init (flax BN running var inits to 1 — fold well-posed);
    # constant params would tie every argmax and void the agreement check
    variables = base.init(key, image[:, :64, :64], train=False)

    folded_model = ResPSPNet(block="basic", layers=(2, 2, 2, 2),
                             num_classes=19, dtype=jnp.bfloat16,
                             fold_bn=True)
    folded_vars = jax.tree.map(jnp.asarray, fold_bn_variables(
        jax.tree.map(np.asarray, variables)))

    h = jnp.int32(out_size[0])
    w = jnp.int32(out_size[1])
    results = {}
    for name, model, vars_ in (("standard", base, variables),
                               ("fold_bn ", folded_model, folded_vars)):
        val_fn = make_fast_val_fn(model, out_size, 19, ignore_label=255)
        for _ in range(3):
            pred, conf = val_fn(vars_, image, label, h, w)
        float(np.asarray(conf)[0, 0])  # value fetch = the only real fence
        steps = 20
        t0 = time.perf_counter()
        for _ in range(steps):
            pred, conf = val_fn(vars_, image, label, h, w)
        float(np.asarray(conf)[0, 0])
        dt = (time.perf_counter() - t0) / steps * 1e3
        results[name.strip()] = (dt, np.asarray(pred))
        print(f"{name}: {dt:7.3f} ms/img", flush=True)

    agree = float(np.mean(results["standard"][1] == results["fold_bn"][1]))
    print(f"pred agreement standard vs folded: {agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
