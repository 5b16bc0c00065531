"""End-to-end VOC training through cli.train — the last dataset-specific
val-shape path without a fit() test: VOC val items are PADDED to (505,505)
with ignore-label borders (data/voc.py:61-70), labels carry 21 classes, and
images decode from JPEG. The in-training eval must run at the
DATASET_EVAL_DEFAULTS size (505,505) with the pad masked via the recorded
original size (reference networks/evaluate.py:156-175 ties the output size
to the dataset; VOC = 505)."""

import os

import numpy as np
import pytest
from PIL import Image

from structure_knowledge_distillation_tpu.cli import train as cli_train


def _make_voc_tree(root, n_train=4, n_val=1, size=(375, 500)):
    """JPEGImages/*.jpg + SegmentationClassAug/*.png + ImageSets lists —
    the layout make_voc_lists / VOCDataset expect. Val frames are smaller
    than 505² so the eval path exercises the pad + in_bounds mask."""
    rng = np.random.default_rng(0)
    h, w = size
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "SegmentationClassAug"), exist_ok=True)
    sets = os.path.join(root, "ImageSets", "Segmentation")
    os.makedirs(sets, exist_ok=True)
    ids = {"train": [f"2007_{i:06d}" for i in range(n_train)],
           "val": [f"2008_{i:06d}" for i in range(n_val)]}
    for split, names in ids.items():
        with open(os.path.join(sets, f"{split}.txt"), "w") as f:
            f.write("".join(n + "\n" for n in names))
        for n in names:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            ann = rng.integers(0, 21, (h, w), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "JPEGImages", f"{n}.jpg"))
            Image.fromarray(ann).save(
                os.path.join(root, "SegmentationClassAug", f"{n}.png"))


@pytest.mark.slow
def test_cli_train_voc_survives_padded_eval(tmp_path):
    root = str(tmp_path / "voc")
    _make_voc_tree(root)
    list_dir = str(tmp_path / "dataset" / "list" / "voc")

    best = cli_train.main([
        "--data-set", "voc",
        "--data-dir", root,
        # nonexistent reference-style paths: ensure_list generates VOC lists
        "--data-list", os.path.join(list_dir, "train_aug.txt"),
        "--val-data-list", os.path.join(list_dir, "val.txt"),
        "--classes_num", "21",
        "--student-arch", "espnet",
        "--teacher-layers", "1,1,1,1",
        "--input-size", "96,128",
        "--imsize-for-adv", "33",
        "--adv-conv-dim", "16",
        "--compute-dtype", "float32",
        "--pi", "true", "--pa", "false", "--ho", "false",
        "--batch-size", "2",
        "--num-steps", "2",
        "--eval-every", "2",
        "--log-every", "1",
        "--log-path", str(tmp_path / "log"),
        "--snapshot-dir", str(tmp_path / "snap"),
    ])
    assert 0.0 <= best <= 1.0
    assert os.path.isfile(os.path.join(list_dir, "val.txt"))
    # the in-training eval ran at the VOC size (padded val frame masked by
    # its original (375,500) extent) and checkpointed
    assert list((tmp_path / "snap").glob("CS_scenes_2_*.msgpack"))
