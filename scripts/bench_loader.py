"""Host loader throughput: PNG decode vs decoded-.npy cache (full-res frames).

Writes N synthetic 1024×2048 Cityscapes-like PNG pairs, then measures
CityscapesDataset samples/s (a) decoding PNGs every epoch, (b) second pass
over the warm .npy cache. Records the ROADMAP numbers for the real-data
pipeline; run on the idle host (single core).

    python scripts/bench_loader.py [--n 8] [--full-res]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_fixtures(root: str, n: int, h: int, w: int) -> str:
    import cv2

    rng = np.random.default_rng(0)
    lines = []
    os.makedirs(f"{root}/leftImg8bit", exist_ok=True)
    os.makedirs(f"{root}/gtFine", exist_ok=True)
    for i in range(n):
        # structured content so PNG decode cost is realistic (not all-flat)
        img = (rng.integers(0, 64, (h, w, 3)) +
               np.linspace(0, 191, w, dtype=np.int64)[None, :, None]).astype(np.uint8)
        lab = rng.integers(0, 34, (h, w)).astype(np.uint8)
        cv2.imwrite(f"{root}/leftImg8bit/f_{i}.png", img)
        cv2.imwrite(f"{root}/gtFine/f_{i}.png", lab)
        lines.append(f"leftImg8bit/f_{i}.png\tgtFine/f_{i}.png\n")
    with open(f"{root}/train.lst", "w") as f:
        f.writelines(lines)
    return f"{root}/train.lst"


def sweep(ds, passes: int, n: int) -> float:
    t0 = time.perf_counter()
    k = 0
    for _ in range(passes):
        for i in range(n):
            ds[i]
            k += 1
    return k / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", default=8, type=int)
    p.add_argument("--size", default="1024,2048", type=str)
    p.add_argument("--passes", default=3, type=int)
    a = p.parse_args()
    h, w = map(int, a.size.split(","))

    from structure_knowledge_distillation_tpu.data import CityscapesDataset

    with tempfile.TemporaryDirectory() as root:
        lst = make_fixtures(root, a.n, h, w)
        ds_png = CityscapesDataset(root, lst, crop_size=(512, 512), seed=0)
        png_rate = sweep(ds_png, a.passes, a.n)
        print(f"png-decode path:   {png_rate:.1f} samples/s")

        cache = os.path.join(root, "cache")
        ds_c = CityscapesDataset(root, lst, crop_size=(512, 512), seed=0,
                                 cache_dir=cache)
        for i in range(a.n):  # warm (decode once)
            ds_c[i]
        cached_rate = sweep(ds_c, a.passes, a.n)
        print(f"warm .npy cache:   {cached_rate:.1f} samples/s "
              f"({cached_rate / png_rate:.1f}x)")


if __name__ == "__main__":
    main()
