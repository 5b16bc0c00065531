"""End-to-end val-sweep wall time per image: f32 vs u8 image wire.

The device-side fast val fn costs ~33 ms/img at full res, but each
Cityscapes frame is 24 MB of f32 — through this environment's ~25 MB/s
relay the transfer dominates the sweep. The u8 wire (evaluate_main's
input_mean) ships 6 MB and de-quantizes on device, exactly.

    python scripts/bench_eval_wire.py [--n 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", default=6, type=int)
    p.add_argument("--size", default="1024,2048", type=str)
    a = p.parse_args()
    h, w = map(int, a.size.split(","))

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/sskd_jax_cache")
    except Exception:
        pass

    from structure_knowledge_distillation_tpu.models import ResPSPNet
    from structure_knowledge_distillation_tpu.training.evaluate import (
        evaluate_main,
    )

    student = ResPSPNet(block="basic", layers=(2, 2, 2, 2), num_classes=19,
                        dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: student.init(key, small, train=False))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    variables["batch_stats"] = jax.tree.map(
        jnp.ones_like, variables["batch_stats"])
    variables = jax.device_put(variables)

    mean = np.array((104.00698793, 116.66876762, 122.67891434), np.float32)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (a.n, 1, h, w, 3)).astype(np.float32)
    imgs = raw - mean
    labs = rng.integers(0, 19, (a.n, 1, h, w)).astype(np.int32)

    results, ius = {}, {}
    for wire in ("f32", "u8"):
        im = mean if wire == "u8" else None

        def run_all():
            items = [(imgs[i], labs[i], np.array([[h, w, 3]]), [f"v{i}"])
                     for i in range(a.n)]
            return evaluate_main(student, variables, items, 19,
                                 out_size=(h, w), eval_type="val",
                                 input_mean=im)

        run_all()  # compile + warm
        t0 = time.perf_counter()
        iu, _ = run_all()
        dt = time.perf_counter() - t0
        results[wire] = dt / a.n
        ius[wire] = iu
    assert ius["f32"] == ius["u8"], ius
    print(json.dumps({
        "metric": "fullres_val_wall_ms_per_img",
        "f32_wire": round(results["f32"] * 1000, 1),
        "u8_wire": round(results["u8"] * 1000, 1),
        "speedup": round(results["f32"] / results["u8"], 2),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
