"""End-to-end standalone eval CLI: dataset defaults, list auto-generation,
and the sharded val sweep agree with the single-device path."""

import os

import numpy as np

from structure_knowledge_distillation_tpu.cli import eval as cli_eval
from tests.test_cli_train_camvid import _make_camvid_tree


def test_cli_eval_camvid_and_sharded(tmp_path):
    root = str(tmp_path / "camvid")
    _make_camvid_tree(root, n_train=1, n_val=2)
    list_dir = str(tmp_path / "dataset" / "list" / "camvid")
    args = [
        "--data-set", "camvid",
        "--data-dir", root,
        "--data-list", os.path.join(list_dir, "val.lst"),  # auto-generated
        "--student-arch", "espnet",
    ]
    miou = cli_eval.main(args)
    assert 0.0 <= miou <= 1.0
    assert os.path.isfile(os.path.join(list_dir, "val.lst"))

    # sharded sweep (2-way data mesh) reproduces the single-device result
    miou_sh = cli_eval.main(args + ["--num-data-shards", "2"])
    np.testing.assert_allclose(miou_sh, miou, atol=1e-6)


def test_cli_eval_spatial_shards(tmp_path):
    root = str(tmp_path / "camvid")
    _make_camvid_tree(root, n_train=1, n_val=1)
    list_dir = str(tmp_path / "list")
    args = [
        "--data-set", "camvid", "--data-dir", root,
        "--data-list", os.path.join(list_dir, "val.lst"),
        "--student-arch", "espnet",
    ]
    miou = cli_eval.main(args)
    miou_sp = cli_eval.main(args + ["--num-spatial-shards", "4"])
    np.testing.assert_allclose(miou_sp, miou, atol=1e-6)
