"""End-to-end CamVid training through cli.train — the run_camvid_espnet.sh
shape (ESPNet student, 11 classes, (360,480) val images).

Regression for two round-2 defects:
  * the train entry hardcoded eval_out_size=(1024,2048) for every
    non-synthetic dataset, so a CamVid/VOC run crashed (broadcast error in
    the fast val path) at its first in-training eval — it must come from
    DATASET_EVAL_DEFAULTS instead (reference networks/evaluate.py:156-175
    ties output size to the dataset);
  * default `./dataset/list/...` paths resolved to nothing — ensure_list now
    generates them from the dataset tree on first use (the reference ships
    its lists in-repo, dataset/list/cityscapes/train.lst).
"""

import os

import numpy as np
import pytest
from PIL import Image

from structure_knowledge_distillation_tpu.cli import train as cli_train


def _make_camvid_tree(root, n_train=4, n_val=1, size=(360, 480)):
    rng = np.random.default_rng(0)
    h, w = size
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(root, split)
        ann_dir = os.path.join(root, split + "annot")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            ann = rng.integers(0, 12, (h, w), dtype=np.uint8)  # 11 = void
            Image.fromarray(img).save(os.path.join(img_dir, f"f{i}.png"))
            Image.fromarray(ann).save(os.path.join(ann_dir, f"f{i}.png"))


@pytest.mark.slow
def test_cli_train_camvid_survives_eval(tmp_path):
    root = str(tmp_path / "camvid")
    _make_camvid_tree(root)
    list_dir = str(tmp_path / "dataset" / "list" / "camvid")

    best = cli_train.main([
        "--data-set", "camvid",
        "--data-dir", root,
        # nonexistent reference-style paths: ensure_list must generate them
        "--data-list", os.path.join(list_dir, "train.lst"),
        "--val-data-list", os.path.join(list_dir, "val.lst"),
        "--classes_num", "11",
        "--student-arch", "espnet",
        "--teacher-layers", "1,1,1,1",
        "--input-size", "96,128",
        "--imsize-for-adv", "33",
        "--adv-conv-dim", "16",
        "--compute-dtype", "float32",
        "--pi", "true", "--pa", "false", "--ho", "false",
        "--batch-size", "2",
        "--num-steps", "2",
        "--eval-every", "2",  # the step that used to crash
        "--log-every", "1",
        "--log-path", str(tmp_path / "log"),
        "--snapshot-dir", str(tmp_path / "snap"),
    ])
    assert 0.0 <= best <= 1.0
    # the generated lists resolved in place of the reference's shipped ones
    assert os.path.isfile(os.path.join(list_dir, "train.lst"))
    assert os.path.isfile(os.path.join(list_dir, "val.lst"))
    # the in-training eval ran at the CamVid-native size and checkpointed
    assert list((tmp_path / "snap").glob("CS_scenes_2_*.msgpack"))


def test_camvid_mean_derived_in_config():
    """TrainConfig derives the dataset BGR mean from data_set so DIRECT
    KDTrainer/evaluate use (not just cli.train) quantizes the u8 wire with
    the right mean; the config-local constant must stay in sync with
    data.camvid.CAMVID_MEAN (config cannot import data without a cycle)."""
    from structure_knowledge_distillation_tpu.config import TrainConfig
    from structure_knowledge_distillation_tpu.data.camvid import CAMVID_MEAN

    import numpy as np

    cfg = TrainConfig(data_set="camvid")
    # config stores exact decimals, CAMVID_MEAN is f32 — equal within 1 ulp
    np.testing.assert_allclose(cfg.input_mean_bgr, CAMVID_MEAN, rtol=1e-6)
    # an explicit override wins over the derivation
    cfg2 = TrainConfig(data_set="camvid", input_mean_bgr=(1.0, 2.0, 3.0))
    assert tuple(cfg2.input_mean_bgr) == (1.0, 2.0, 3.0)
    # other datasets keep the cityscapes/voc default
    assert TrainConfig().input_mean_bgr[0] == 104.00698793
    assert TrainConfig(data_set="voc").input_mean_bgr[0] == 104.00698793
