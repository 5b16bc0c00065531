"""CamVid dataset (11-class road-scene segmentation, 360×480).

The reference's CamVid rows (ESPNet student, README.md:12-18) ran through an
external codebase; here CamVid is a first-class dataset so the ESPNet-student
transfer config is reproducible in-framework. List lines are
"image_path label_path" (labels already trainIds 0..10, ignore 11→255
configurable).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from structure_knowledge_distillation_tpu.data.cityscapes import (
    _imread_color_bgr,
    _imread_gray,
    _parse_lst,
    _resize,
)

__all__ = ["CamVidDataset", "CAMVID_MEAN"]

CAMVID_MEAN = np.array((105.39, 108.85, 110.44), dtype=np.float32)  # BGR


class CamVidDataset:
    def __init__(self, root: str, list_path: str, max_iters: Optional[int] = None,
                 crop_size: Tuple[int, int] = (360, 480),
                 mean: np.ndarray = CAMVID_MEAN, scale: bool = True,
                 mirror: bool = True, ignore_label: int = 255,
                 void_class: Optional[int] = 11, seed: int = 0):
        self.records = _parse_lst(root, list_path, with_labels=True)
        if max_iters is not None and self.records:
            reps = int(np.ceil(float(max_iters) / len(self.records)))
            self.records = self.records * reps
        self.crop_h, self.crop_w = crop_size
        self.mean = np.asarray(mean, np.float32)
        self.scale = scale
        self.mirror = mirror
        self.ignore_label = ignore_label
        self.void_class = void_class
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.records)

    def __getitem__(self, index: int):
        rec = self.records[index]
        image = _imread_color_bgr(rec.img)
        label = _imread_gray(rec.label).astype(np.int32)
        if self.void_class is not None:
            label[label == self.void_class] = self.ignore_label
        size = np.array(image.shape)
        if self.scale:
            f = 0.7 + int(self.rng.integers(0, 15)) / 10.0
            image = _resize(image, f, nearest=False)
            label = _resize(label.astype(np.uint8), f, nearest=True).astype(np.int32)
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
                np.ascontiguousarray(label, np.int32), size, rec.name)
