"""Fenced eval-path bench: fast val fn (fwd + upsample + argmax + confusion)
with the fused Pallas argmax kernel vs the XLA resize+argmax path.

    python scripts/bench_eval.py
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
    from structure_knowledge_distillation_tpu.ops.pallas_eval import (
        upsampled_argmax,
    )
    from structure_knowledge_distillation_tpu.ops.resize import (
        resize_bilinear_align_corners,
    )
    from structure_knowledge_distillation_tpu.training.evaluate import (
        confusion_matrix,
    )

    student = ResPSPNet(block="basic", layers=(2, 2, 2, 2), num_classes=19,
                        dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    for out_size in ((512, 512), (1024, 2048)):
        image = jax.random.normal(key, (1, *out_size, 3), jnp.float32)
        label = jax.random.randint(key, out_size, 0, 19)
        variables = jax.eval_shape(
            lambda: student.init(key, image[:, :64, :64], train=False))
        variables = jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), variables)

        def make(fused: bool):
            @jax.jit
            def run(variables, image, label):
                preds = student.apply(variables, image, train=False)
                logits = preds[0]
                if fused:
                    pred = upsampled_argmax(logits, out_size)[0]
                else:
                    up = resize_bilinear_align_corners(
                        logits.astype(jnp.float32), out_size)
                    pred = jnp.argmax(up[0], axis=-1)
                return confusion_matrix(pred.astype(jnp.uint8), label, 19, 255)
            return run

        for name, fused in (("xla ", False), ("fused", True)):
            fn = make(fused)
            for _ in range(3):
                conf = fn(variables, image, label)
            float(np.asarray(conf)[0, 0])
            steps = 20
            t0 = time.perf_counter()
            for _ in range(steps):
                conf = fn(variables, image, label)
            float(np.asarray(conf)[0, 0])
            dt = (time.perf_counter() - t0) / steps * 1e3
            print(f"{out_size} {name}: {dt:7.3f} ms/img", flush=True)


if __name__ == "__main__":
    main()
