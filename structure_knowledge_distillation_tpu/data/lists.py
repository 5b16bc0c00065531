"""Dataset list-file generation.

The reference ships `dataset/list/cityscapes/{train,val,test}.lst` with
"image<TAB>label" lines relative to the data root (2975/500/1525 lines). This
repo generates them from a standard Cityscapes tree instead of checking in
data-specific files:

    leftImg8bit/{split}/{city}/*_leftImg8bit.png
    gtFine/{split}/{city}/*_gtFine_labelIds.png
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

__all__ = ["make_cityscapes_lists"]


def make_cityscapes_lists(root: str, out_dir: Optional[str] = None) -> dict:
    """Scan a Cityscapes root and write train/val/test .lst files.

    Returns {split: path}. Test entries have no label column (matches the
    reference's test.lst consumed by CSDataTestSet).
    """
    out_dir = out_dir or osp.join(root, "list")
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for split in ("train", "val", "test"):
        img_dir = osp.join(root, "leftImg8bit", split)
        if not osp.isdir(img_dir):
            continue
        lines = []
        for city in sorted(os.listdir(img_dir)):
            city_dir = osp.join(img_dir, city)
            for fname in sorted(os.listdir(city_dir)):
                if not fname.endswith("_leftImg8bit.png"):
                    continue
                rel_img = osp.join("leftImg8bit", split, city, fname)
                if split == "test":
                    lines.append(rel_img + "\n")
                else:
                    label = fname.replace("_leftImg8bit.png", "_gtFine_labelIds.png")
                    rel_label = osp.join("gtFine", split, city, label)
                    lines.append(f"{rel_img}\t{rel_label}\n")
        path = osp.join(out_dir, f"{split}.lst")
        with open(path, "w") as f:
            f.writelines(lines)
        written[split] = path
    return written
