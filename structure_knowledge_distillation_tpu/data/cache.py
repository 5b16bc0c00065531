"""Decoded-image cache: one-time PNG/JPG decode to raw .npy, mmap reads after.

PNG decode of a 2-MP Cityscapes frame costs ~50-100 ms on one host core
(10-20 img/s) — far below the ~130 img/s a single TPU chip consumes
(ROADMAP.md). The reference hid this behind 4 DataLoader worker processes
(reference train_and_eval.py:13-15); on a thin host the decode itself is the
bottleneck, so instead each file is decoded ONCE into a raw uint8 .npy and
every later epoch reads it back as a zero-copy memory map (disk-bandwidth
bound, ~milliseconds per frame).

Cache layout: <cache_dir>/<sha1(abspath)[:16]>_<basename>.npy, written
atomically (tmp + rename) so concurrent processes can share a cache dir.
"""

from __future__ import annotations

import hashlib
import os
import os.path as osp
from typing import Callable, Optional

import numpy as np

__all__ = ["cached_decode", "warm_cache"]


def _cache_path(cache_dir: str, path: str) -> str:
    digest = hashlib.sha1(osp.abspath(path).encode()).hexdigest()[:16]
    stem = osp.splitext(osp.basename(path))[0]
    return osp.join(cache_dir, f"{digest}_{stem}.npy")


def cached_decode(path: str, reader: Callable[[str], np.ndarray],
                  cache_dir: Optional[str], mmap: bool = True) -> np.ndarray:
    """reader(path) with a write-once .npy cache; mmap'd reads thereafter."""
    if not cache_dir:
        return reader(path)
    cpath = _cache_path(cache_dir, path)
    if osp.exists(cpath):
        return np.load(cpath, mmap_mode="r" if mmap else None)
    arr = reader(path)
    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{cpath[:-len('.npy')]}.tmp{os.getpid()}.npy"  # np.save appends .npy
    np.save(tmp, arr)
    os.replace(tmp, cpath)
    return arr


def warm_cache(dataset, indices=None) -> int:
    """Pre-decode every (unique) record of a cache-enabled dataset."""
    records = getattr(dataset, "records", [])
    n = 0
    seen = set()
    for i in (indices if indices is not None else range(len(records))):
        rec = records[i]
        key = rec.img if hasattr(rec, "img") else rec
        if key in seen:
            continue
        seen.add(key)
        dataset[i]
        n += 1
    return n
