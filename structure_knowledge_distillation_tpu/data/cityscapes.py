"""Cityscapes dataset + augmentation pipeline (host side), NHWC-native.

Behavioral contract from reference dataset/datasets.py:121-250 (CSDataSet /
CSDataTestSet):
  * `.lst` lines are "image_path<TAB>label_path" relative to the data root,
  * labels are mapped labelId→trainId (34→19 + ignore 255),
  * train aug: random scale in {0.7, 0.8, …, 2.1} (cv2 INTER_LINEAR image /
    INTER_NEAREST label), BGR mean subtraction (104.00698793, 116.66876762,
    122.67891434), zero/ignore padding up to the crop, random crop, random
    horizontal flip,
  * val: full-res 1024×2048, mean subtraction only,
  * test: no labels.

Differences by design: images stay HWC (NHWC batches — TPU layout); labels
stay int32; randomness comes from an explicit np.random.Generator so runs are
reproducible. cv2 is used when present, with a PIL+numpy fallback so the
pipeline works in minimal images.
"""

from __future__ import annotations

import os.path as osp
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

try:  # pragma: no cover - exercised implicitly
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

__all__ = [
    "IMG_MEAN_BGR",
    "ID_TO_TRAINID_LUT",
    "id2trainid",
    "trainid2id",
    "CityscapesDataset",
    "CityscapesTestDataset",
    "batch_iterator",
]

# BGR mean, reference train_and_eval.py:10 / evaluate.py:21.
IMG_MEAN_BGR = np.array((104.00698793, 116.66876762, 122.67891434), dtype=np.float32)

_IGNORE = 255
# labelId -> trainId (reference datasets.py:146-151).
_ID_TO_TRAINID = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}

ID_TO_TRAINID_LUT = np.full(256, _IGNORE, dtype=np.uint8)
for _k, _v in _ID_TO_TRAINID.items():
    ID_TO_TRAINID_LUT[_k] = _v

_TRAINID_TO_ID_LUT = np.zeros(256, dtype=np.uint8)
for _k, _v in _ID_TO_TRAINID.items():
    _TRAINID_TO_ID_LUT[_v] = _k


def id2trainid(label: np.ndarray) -> np.ndarray:
    """labelId (0..33) -> trainId (0..18 / 255), via LUT."""
    return ID_TO_TRAINID_LUT[label]


def trainid2id(label: np.ndarray) -> np.ndarray:
    """trainId -> labelId, for test-server submission PNGs
    (reference evaluate.py:30-38,188)."""
    return _TRAINID_TO_ID_LUT[label]


def _imread_color_bgr(path: str) -> np.ndarray:
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img
    from PIL import Image

    rgb = np.asarray(Image.open(path).convert("RGB"))
    return rgb[:, :, ::-1].copy()


def _imread_gray(path: str) -> np.ndarray:
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return img
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"))


def _resize(img: np.ndarray, fx: float, nearest: bool) -> np.ndarray:
    if _HAS_CV2:
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        return cv2.resize(img, None, fx=fx, fy=fx, interpolation=interp)
    from PIL import Image

    h, w = img.shape[:2]
    new = (int(round(w * fx)), int(round(h * fx)))
    mode = Image.NEAREST if nearest else Image.BILINEAR
    return np.asarray(Image.fromarray(img).resize(new, mode))


@dataclass
class _Record:
    img: str
    label: Optional[str]
    name: str


def _parse_lst(root: str, list_path: str, with_labels: bool) -> list:
    records = []
    with open(list_path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            img_path = osp.join(root, parts[0])
            if with_labels:
                label_path = osp.join(root, parts[1])
                name = osp.splitext(osp.basename(parts[1]))[0]
            else:
                label_path = None
                name = osp.splitext(osp.basename(parts[0]))[0]
            records.append(_Record(img_path, label_path, name))
    return records


class CityscapesDataset:
    """Train/val dataset with reference augmentation semantics."""

    def __init__(
        self,
        root: str,
        list_path: str,
        max_iters: Optional[int] = None,
        crop_size: Tuple[int, int] = (512, 512),
        mean: np.ndarray = IMG_MEAN_BGR,
        scale: bool = True,
        mirror: bool = True,
        ignore_label: int = 255,
        seed: int = 0,
        use_native: bool = True,
        cache_dir: Optional[str] = None,
    ):
        self.records = _parse_lst(root, list_path, with_labels=True)
        if max_iters is not None and self.records:
            reps = int(np.ceil(float(max_iters) / len(self.records)))
            self.records = self.records * reps
        self.crop_h, self.crop_w = crop_size
        self.mean = np.asarray(mean, np.float32)
        self.scale = scale
        self.mirror = mirror
        self.ignore_label = ignore_label
        self.cache_dir = cache_dir
        self.rng = np.random.default_rng(seed)
        if use_native:
            from structure_knowledge_distillation_tpu.data.native import get_native_lib

            use_native = get_native_lib() is not None
        self.use_native = use_native

    def __len__(self) -> int:
        return len(self.records)

    def _read(self, path: str, gray: bool) -> np.ndarray:
        from structure_knowledge_distillation_tpu.data.cache import cached_decode

        return cached_decode(path, _imread_gray if gray else _imread_color_bgr,
                             self.cache_dir)

    def __getitem__(self, index: int):
        rec = self.records[index]
        image = self._read(rec.img, gray=False)
        if self.use_native:
            return self._getitem_native(rec, image)
        label = id2trainid(self._read(rec.label, gray=True))
        size = np.array(image.shape)

        if self.scale:
            # f ∈ {0.7, 0.8, ..., 2.1} (reference datasets.py:157-161)
            f = 0.7 + int(self.rng.integers(0, 15)) / 10.0
            image = _resize(image, f, nearest=False)
            label = _resize(label, f, nearest=True)

        image = image.astype(np.float32) - self.mean
        img_h, img_w = label.shape
        pad_h = max(self.crop_h - img_h, 0)
        pad_w = max(self.crop_w - img_w, 0)
        if pad_h > 0 or pad_w > 0:
            image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=0.0)
            label = np.pad(label, ((0, pad_h), (0, pad_w)),
                           constant_values=self.ignore_label)
        img_h, img_w = label.shape
        h_off = int(self.rng.integers(0, img_h - self.crop_h + 1))
        w_off = int(self.rng.integers(0, img_w - self.crop_w + 1))
        image = image[h_off:h_off + self.crop_h, w_off:w_off + self.crop_w]
        label = label[h_off:h_off + self.crop_h, w_off:w_off + self.crop_w]

        if self.mirror and bool(self.rng.integers(0, 2)):
            image = image[:, ::-1]
            label = label[:, ::-1]

        return (
            np.ascontiguousarray(image, np.float32),
            np.ascontiguousarray(label, np.int32),
            size,
            rec.name,
        )

    def _getitem_native(self, rec, image: np.ndarray):
        """One-pass C++ augmentation; identical rng draw order to the numpy
        path so both produce the same geometry for a given seed."""
        from structure_knowledge_distillation_tpu.data.native import native_augment

        raw_label = self._read(rec.label, gray=True)
        size = np.array(image.shape)
        f = 1.0
        if self.scale:
            f = 0.7 + int(self.rng.integers(0, 15)) / 10.0
        new_h = int(round(image.shape[0] * f))
        new_w = int(round(image.shape[1] * f))
        img_h = max(new_h, self.crop_h)
        img_w = max(new_w, self.crop_w)
        h_off = int(self.rng.integers(0, img_h - self.crop_h + 1))
        w_off = int(self.rng.integers(0, img_w - self.crop_w + 1))
        flip = bool(self.rng.integers(0, 2)) if self.mirror else False
        out_img, out_label = native_augment(
            image, raw_label, f, (self.crop_h, self.crop_w), h_off, w_off,
            flip, self.mean, ID_TO_TRAINID_LUT, self.ignore_label,
        )
        return out_img, out_label, size, rec.name


class CityscapesTestDataset:
    """Full-res test dataset: mean-subtract (+ pad up to crop) only
    (reference datasets.py:212-250)."""

    def __init__(self, root: str, list_path: str,
                 crop_size: Tuple[int, int] = (1024, 2048),
                 mean: np.ndarray = IMG_MEAN_BGR):
        self.records = _parse_lst(root, list_path, with_labels=False)
        self.crop_h, self.crop_w = crop_size
        self.mean = np.asarray(mean, np.float32)

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, index: int):
        rec = self.records[index]
        image = _imread_color_bgr(rec.img)
        size = np.array(image.shape)
        image = image.astype(np.float32) - self.mean
        pad_h = max(self.crop_h - image.shape[0], 0)
        pad_w = max(self.crop_w - image.shape[1], 0)
        if pad_h > 0 or pad_w > 0:
            image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=0.0)
        return np.ascontiguousarray(image, np.float32), size, rec.name


_WORKER_DATASET = None


def _worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_fetch(indices):
    return [_WORKER_DATASET[int(i)] for i in indices]


def _stack(samples) -> tuple:
    cols = list(zip(*samples))
    return tuple(
        np.stack(col) if isinstance(col[0], np.ndarray) else list(col)
        for col in cols
    )


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epochs: int = 1,
    num_workers: int = 0,
    num_shards: int = 1,
    shard_index: int = 0,
) -> Iterator[tuple]:
    """Host-side batcher producing stacked NHWC numpy batches.

    Like the reference's DataLoader (train_and_eval.py:13-17): the order is
    reshuffled at the start of every epoch pass (epochs > 1 iterates the
    dataset multiple times with fresh shuffles from one rng stream), and
    num_workers > 0 decodes/augments batches in worker processes (each worker
    holds its own dataset copy + rng stream, so augmentation draws differ
    from the serial order — exactly the torch-workers property). Up to 2
    batches are in flight ahead of the consumer.

    Multi-host (multi-controller JAX): pass num_shards=jax.process_count(),
    shard_index=jax.process_index(). `batch_size` stays the GLOBAL batch;
    every process draws the identical shuffled order (same seeded rng) and
    takes its contiguous batch_size/num_shards slice of each global batch,
    so the per-process iterators partition each global batch exactly —
    assemble with jax.make_array_from_process_local_data (see
    data.prefetch.put_global).
    """
    if batch_size % num_shards:
        raise ValueError(f"global batch {batch_size} not divisible by "
                         f"{num_shards} processes")
    if num_shards > 1 and not drop_last:
        raise ValueError("multi-host sharding requires drop_last "
                         "(a short tail batch cannot be partitioned evenly)")
    local = batch_size // num_shards
    lo, hi = shard_index * local, (shard_index + 1) * local
    rng = np.random.default_rng(seed)
    n = len(dataset)
    end = n - (n % batch_size) if drop_last else n

    def index_batches():
        for _ in range(epochs):
            order = np.arange(n)
            if shuffle:
                rng.shuffle(order)
            for start in range(0, end, batch_size):
                yield order[start:start + batch_size][lo:hi]

    if num_workers <= 0:
        for idx in index_batches():
            yield _stack([dataset[int(i)] for i in idx])
        return

    import collections
    import multiprocessing
    from concurrent.futures import ProcessPoolExecutor

    # spawn, NOT fork: the training process is JAX-multithreaded (and on the
    # real chip holds a live grpc TPU client) by the time the loader starts —
    # forked children inherit copied-while-locked mutexes and deadlock
    # (observed: workers wedge after the first decode). Spawned children
    # re-import cleanly; the dataset object ships via the initializer.
    with ProcessPoolExecutor(num_workers, initializer=_worker_init,
                             initargs=(dataset,),
                             mp_context=multiprocessing.get_context("spawn")) as pool:
        pending: "collections.deque" = collections.deque()
        it = index_batches()
        try:
            for _ in range(2 * num_workers):
                pending.append(pool.submit(_worker_fetch, next(it)))
        except StopIteration:
            it = iter(())
        while pending:
            samples = pending.popleft().result()
            try:
                pending.append(pool.submit(_worker_fetch, next(it)))
            except StopIteration:
                pass
            yield _stack(samples)
