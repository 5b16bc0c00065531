"""Test/submission entry point — counterpart of reference test.py.

    python -m structure_knowledge_distillation_tpu.cli.test \
        --resume-from ./ckpt/CS_scenes_39326_0.75.pth --data-dir ../cityscapes

Loads a student checkpoint (torch .pth via the importer, or a native
.msgpack), runs full-res inference over the test list, and writes
trainId→labelId-remapped palette PNGs for server submission
(reference networks/evaluate.py:187-191).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from structure_knowledge_distillation_tpu.config import TestConfig
from structure_knowledge_distillation_tpu.data import CityscapesTestDataset, batch_iterator
from structure_knowledge_distillation_tpu.models import student_model
from structure_knowledge_distillation_tpu.training import checkpoint as ckpt_io
from structure_knowledge_distillation_tpu.training.evaluate import evaluate_main

log = logging.getLogger(__name__)


def main(argv=None):
    cfg = TestConfig.from_args(argv)
    for key, val in vars(cfg).items():
        print(f"{key} : {val}")

    model = student_model(num_classes=cfg.classes_num)
    dummy = jnp.zeros((1, 1024, 2048, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    if cfg.resume_from.endswith(".msgpack"):
        variables = ckpt_io.load_student_variables(cfg.resume_from, variables)
    elif cfg.resume_from:
        sd = ckpt_io.load_torch_state_dict(cfg.resume_from)
        variables = ckpt_io.import_torch_respspnet(sd, variables)

    from structure_knowledge_distillation_tpu.data.lists import ensure_list

    data_list = ensure_list(cfg.data_set, cfg.data_dir, cfg.data_list)
    if cfg.data_set == "voc":
        from structure_knowledge_distillation_tpu.data import VOCTestDataset

        ds = VOCTestDataset(cfg.data_dir, data_list, crop_size=(505, 505))
    else:
        ds = CityscapesTestDataset(cfg.data_dir, data_list, crop_size=(1024, 2048))
    loader = batch_iterator(ds, 1, shuffle=False, drop_last=False)
    out_size = (505, 505) if cfg.data_set == "voc" else (1024, 2048)
    evaluate_main(
        model, variables, loader, cfg.classes_num, out_size=out_size,
        eval_type="test", output_dir=cfg.output_dir, whole=cfg.whole,
        scales=cfg.scales, flip=cfg.flip,
        remap_train_ids=cfg.data_set != "voc",
    )
    log.info("wrote submission PNGs to %s", cfg.output_dir)


if __name__ == "__main__":
    main()
