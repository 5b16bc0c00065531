"""End-to-end REAL-DATA training bench: the actual cli.train input path
(PNG fixtures → decode cache → fused C++ augment → worker processes → host
chunk stacking → device_prefetch → scanned device loop) composed with the
full Pi+Pa+Ho recipe on the TPU.

Counterpart of reference train_and_eval.py:13-26 (DataLoader(workers,
pin_memory) feeding the train loop). The synthetic-input bench (bench.py)
isolates device throughput; THIS script answers whether the 1-core host can
actually feed the chip at that rate.

    python scripts/bench_realdata.py [--steps 60] [--unroll 10] [--workers 2]

Prints one JSON line:
    {"metric": "realdata_img_per_sec", "value": ..., ...}

Timing discipline: one value-fetch fence at the end of the timed window
(`jax.block_until_ready` does not force execution through the axon relay —
see bench.py); the warmup chunk absorbs compile + cache-decode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_loader import make_fixtures  # noqa: E402  (sibling script)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-images", default=16, type=int)
    p.add_argument("--steps", default=60, type=int, help="timed steps")
    p.add_argument("--warmup-chunks", default=1, type=int)
    p.add_argument("--unroll", default=10, type=int)
    p.add_argument("--workers", default=2, type=int)
    p.add_argument("--batch-size", default=8, type=int)
    p.add_argument("--root", default="/tmp/sskd_realdata", type=str,
                   help="fixture dir (persisted so repeat runs skip decode)")
    p.add_argument("--teacher-layers", default="3,4,23,3", type=str)
    p.add_argument("--wire", default="bf16", choices=("f32", "bf16", "u8"),
                   help="host→device image format: f32 (naive), bf16 "
                        "(lossless vs the model's input cast), u8 "
                        "(re-quantized bytes, de-quantized on device)")
    a = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sskd_jax_cache")

    os.makedirs(a.root, exist_ok=True)
    lst = os.path.join(a.root, "train.lst")
    if not os.path.isfile(lst):
        make_fixtures(a.root, a.n_images, 1024, 2048)

    import jax

    from structure_knowledge_distillation_tpu.config import TrainConfig
    from structure_knowledge_distillation_tpu.data import (
        CityscapesDataset,
        batch_iterator,
        chunk_batches,
        device_prefetch,
    )
    from structure_knowledge_distillation_tpu.training.trainer import KDTrainer

    total_steps = a.steps + a.warmup_chunks * a.unroll
    cfg = TrainConfig(
        data_set="cityscapes", batch_size=a.batch_size, input_size=(512, 512),
        num_steps=total_steps, unroll_steps=a.unroll,
        teacher_layers=tuple(int(x) for x in a.teacher_layers.split(",")),
        pi=True, pa=True, ho=True, adv_loss_type="wgan-gp",
        compute_dtype="bfloat16", log_path="", snapshot_dir="/tmp/sskd_rd_snap",
        decode_cache_dir=os.path.join(a.root, "cache"),
    )
    ds = CityscapesDataset(
        a.root, lst, max_iters=total_steps * cfg.batch_size,
        crop_size=cfg.input_size, scale=True, mirror=True, seed=0,
        cache_dir=cfg.decode_cache_dir,
    )
    trainer = KDTrainer(cfg)

    host_iter = batch_iterator(ds, cfg.batch_size, shuffle=True, seed=0,
                               num_workers=a.workers)
    if a.wire != "f32":
        from structure_knowledge_distillation_tpu.data import cast_batches

        if a.wire == "u8":
            host_iter = cast_batches(
                host_iter, "uint8", "uint8",
                image_mean=np.asarray(cfg.input_mean_bgr, np.float32))
        else:
            import ml_dtypes

            host_iter = cast_batches(host_iter, ml_dtypes.bfloat16, "uint8")
    train_iter = device_prefetch(
        chunk_batches(host_iter, a.unroll),
        sharding=trainer.batch_sharding,
    )

    valid = np.ones((a.unroll,), bool)

    def fence(metrics_k):
        return float(np.asarray(metrics_k["g_loss"][-1]))

    if a.steps < a.unroll:
        raise SystemExit(f"--steps {a.steps} must be >= --unroll {a.unroll} "
                         "(otherwise zero timed chunks)")
    # warmup: compile + first decode pass through the cache
    t0 = time.perf_counter()
    t_start = t0  # --warmup-chunks 0: time from the first dispatch
    n_chunks = 0
    last = None
    for chunk in train_iter:
        images_k, labels_k, _ = chunk
        trainer.state, metrics_k = trainer.train_loop(
            trainer.state, images_k, labels_k, valid)
        last = metrics_k
        n_chunks += 1
        if n_chunks == a.warmup_chunks:
            fence(last)
            t_start = time.perf_counter()
        if n_chunks == a.warmup_chunks + a.steps // a.unroll:
            break
    g_loss = fence(last)  # single end fence: keeps host/device overlap honest
    t_end = time.perf_counter()

    timed_steps = (n_chunks - a.warmup_chunks) * a.unroll
    dt = t_end - t_start
    img_s = timed_steps * cfg.batch_size / dt
    out = {
        "metric": "realdata_img_per_sec",
        "value": round(img_s, 2),
        "unit": "img/s/chip",
        "timed_steps": timed_steps,
        "unroll": a.unroll,
        "workers": a.workers,
        "warmup_s": round(t_start - t0, 1),
        "g_loss": round(g_loss, 4),
        "wire": a.wire,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
