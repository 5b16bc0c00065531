"""Pascal VOC dataset (reference dataset/datasets.py:12-119).

Lists are bare ids; images live in JPEGImages/, labels in
SegmentationClassAug/. Train aug: random scale 0.5–1.6 (×0.1 steps), mean
subtraction (128,128,128), pad (0 / ignore) to crop, random crop, random
mirror.
"""

from __future__ import annotations

import os.path as osp
from typing import Optional, Tuple

import numpy as np

from structure_knowledge_distillation_tpu.data.cityscapes import (
    _imread_color_bgr,
    _imread_gray,
    _resize,
)

__all__ = ["VOCDataset", "VOCTestDataset"]

VOC_MEAN = np.array((128.0, 128.0, 128.0), dtype=np.float32)


class VOCDataset:
    def __init__(self, root: str, list_path: str, max_iters: Optional[int] = None,
                 crop_size: Tuple[int, int] = (321, 321), mean: np.ndarray = VOC_MEAN,
                 scale: bool = True, mirror: bool = True, ignore_label: int = 255,
                 seed: int = 0):
        with open(list_path) as f:
            ids = [line.strip() for line in f if line.strip()]
        if max_iters is not None and ids:
            ids = ids * int(np.ceil(float(max_iters) / len(ids)))
        self.records = [
            (osp.join(root, f"JPEGImages/{i}.jpg"),
             osp.join(root, f"SegmentationClassAug/{i}.png"), i)
            for i in ids
        ]
        self.crop_h, self.crop_w = crop_size
        self.mean = np.asarray(mean, np.float32)
        self.scale = scale
        self.mirror = mirror
        self.ignore_label = ignore_label
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.records)

    def __getitem__(self, index: int):
        img_path, label_path, name = self.records[index]
        image = _imread_color_bgr(img_path)
        label = _imread_gray(label_path)
        size = np.array(image.shape)
        if self.scale:
            f = 0.5 + int(self.rng.integers(0, 12)) / 10.0  # 0.5 .. 1.6
            image = _resize(image, f, nearest=False)
            label = _resize(label, f, nearest=True)
        image = image.astype(np.float32) - self.mean
        pad_h = max(self.crop_h - label.shape[0], 0)
        pad_w = max(self.crop_w - label.shape[1], 0)
        if pad_h > 0 or pad_w > 0:
            image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=0.0)
            label = np.pad(label, ((0, pad_h), (0, pad_w)),
                           constant_values=self.ignore_label)
        h_off = int(self.rng.integers(0, label.shape[0] - self.crop_h + 1))
        w_off = int(self.rng.integers(0, label.shape[1] - self.crop_w + 1))
        image = image[h_off:h_off + self.crop_h, w_off:w_off + self.crop_w]
        label = label[h_off:h_off + self.crop_h, w_off:w_off + self.crop_w]
        if self.mirror and bool(self.rng.integers(0, 2)):
            image = image[:, ::-1]
            label = label[:, ::-1]
        return (np.ascontiguousarray(image, np.float32),
                np.ascontiguousarray(label.astype(np.int32)), size, name)


class VOCTestDataset:
    def __init__(self, root: str, list_path: str,
                 crop_size: Tuple[int, int] = (505, 505), mean: np.ndarray = VOC_MEAN):
        with open(list_path) as f:
            ids = [line.strip() for line in f if line.strip()]
        self.records = [(osp.join(root, f"JPEGImages/{i}.jpg"), i) for i in ids]
        self.crop_h, self.crop_w = crop_size
        self.mean = np.asarray(mean, np.float32)

    def __len__(self):
        return len(self.records)

    def __getitem__(self, index: int):
        img_path, name = self.records[index]
        image = _imread_color_bgr(img_path)
        size = np.array(image.shape)
        image = image.astype(np.float32) - self.mean
        pad_h = max(self.crop_h - image.shape[0], 0)
        pad_w = max(self.crop_w - image.shape[1], 0)
        if pad_h > 0 or pad_w > 0:
            image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=0.0)
        return np.ascontiguousarray(image, np.float32), size, name
