"""Wall time of the device-fused multiscale+flip val sweep at full res.

The reference-shaped host path pulls (1024,2048,19) f32 logits back PER
SCALE (159 MB; ≥16 s/img through this relay at 3 scales + flip) and zooms
inputs with host scipy. The fused path ships the input once (u8 wire) and
returns 2 MB of prediction + the confusion counts.

    python scripts/bench_msf.py [--scales 0.75,1.0,1.25] [--n 4]
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
    p.add_argument("--n", default=4, type=int)
    p.add_argument("--scales", default="0.75,1.0,1.25", type=str)
    p.add_argument("--size", default="1024,2048", type=str)
    a = p.parse_args()
    h, w = map(int, a.size.split(","))
    scales = tuple(float(s) for s in a.scales.split(","))

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
    shapes = jax.eval_shape(
        lambda: student.init(key, jnp.zeros((1, 64, 64, 3)), train=False))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    variables["batch_stats"] = jax.tree.map(
        jnp.ones_like, variables["batch_stats"])
    variables = jax.device_put(variables)

    mean = np.array((104.00698793, 116.66876762, 122.67891434), np.float32)
    rng = np.random.default_rng(0)
    items = [
        (rng.integers(0, 256, (1, h, w, 3)).astype(np.float32) - mean,
         rng.integers(0, 19, (1, h, w)).astype(np.int32),
         np.array([[h, w, 3]]), [f"v{i}"])
        for i in range(a.n)
    ]

    def sweep():
        return evaluate_main(student, variables, items, 19, out_size=(h, w),
                             eval_type="val", whole=True, scales=scales,
                             flip=True, input_mean=mean)

    sweep()  # compile + warm
    t0 = time.perf_counter()
    iu, _ = sweep()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "msf_val_wall_ms_per_img",
        "value": round(dt / a.n * 1000, 1),
        "scales": list(scales), "flip": True,
        "mean_iu": round(float(iu), 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
