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


@pytest.mark.slow
def test_cli_train_resume_trains_only_remaining_budget(tmp_path):
    """An auto-resumed run trains num_steps - resumed_step steps, NOT
    num_steps more: the reference loop is `range(num_steps - last_step)`
    after restoring (train_and_eval.py:20-22, utils/utils.py:108-127).
    Regression for the round-5 real-chip leg that resumed at step 300 of a
    400-step budget and ran to step 700 with the poly lr pinned at 0."""
    import json

    root = str(tmp_path / "camvid")
    _make_camvid_tree(root)
    list_dir = str(tmp_path / "dataset" / "list" / "camvid")

    common = [
        "--data-set", "camvid",
        "--data-dir", root,
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
        "--eval-every", "2",
        "--log-every", "1",
        "--snapshot-dir", str(tmp_path / "snap"),
        # resolves to nothing -> the S_resume branch falls through to
        # try_resume (newest async orbax checkpoint in snapshot_dir)
        "--S_ckpt_path", str(tmp_path / "no-such-student"),
    ]
    # leg 1: 2 of 4 steps; the eval at step 2 writes the async orbax ckpt
    cli_train.main(common + ["--num-steps", "2",
                             "--log-path", str(tmp_path / "log1")])

    # leg 2: same snapshot_dir, full 4-step budget -> exactly steps 3, 4
    cli_train.main(common + ["--num-steps", "4", "--S_resume", "true",
                             "--log-path", str(tmp_path / "log2")])
    with open(tmp_path / "log2" / "scalars.jsonl") as f:
        rows = [json.loads(line) for line in f]
    train_steps = sorted(r["step"] for r in rows if "g_loss" in r)
    assert train_steps == [3, 4], train_steps
