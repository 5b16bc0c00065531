"""Standalone val-set evaluation: checkpoint → mean IU + per-class IUs.

    python -m structure_knowledge_distillation_tpu.cli.eval \
        --resume-from ./snapshots/CS_scenes_39999_0.75.msgpack \
        --data-dir ../cityscapes --data-list ../cityscapes/list/val.lst

Equivalent of the reference's in-training `evalute_model` path
(networks/kd_model.py:175 → networks/evaluate.py:156) as its own entry.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from structure_knowledge_distillation_tpu.config import str2bool
from structure_knowledge_distillation_tpu.data import CityscapesDataset, batch_iterator
from structure_knowledge_distillation_tpu.models import student_model
from structure_knowledge_distillation_tpu.training import checkpoint as ckpt_io
from structure_knowledge_distillation_tpu.training.evaluate import evaluate_main


def main(argv=None):
    p = argparse.ArgumentParser(description="val-set mIoU evaluation (TPU)")
    p.add_argument("--data-dir", default="", type=str)
    p.add_argument("--data-list", default="dataset/list/cityscapes/val.lst", type=str)
    p.add_argument("--resume-from", default="", type=str)
    p.add_argument("--classes_num", default=19, type=int)
    p.add_argument("--output-dir", default="", type=str)
    p.add_argument("--whole", default=True, type=str2bool)
    p.add_argument("--flip", default=False, type=str2bool)
    p.add_argument("--scales", default="1.0", type=str)
    p.add_argument("--eval-size", default="1024,2048", type=str)
    args = p.parse_args(argv)
    out_h, out_w = map(int, args.eval_size.split(","))

    model = student_model(num_classes=args.classes_num)
    dummy = jnp.zeros((1, out_h, out_w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    if args.resume_from.endswith(".msgpack"):
        variables = ckpt_io.load_student_variables(args.resume_from, variables)
    elif args.resume_from:
        sd = ckpt_io.load_torch_state_dict(args.resume_from)
        variables = ckpt_io.import_torch_respspnet(sd, variables)

    ds = CityscapesDataset(args.data_dir, args.data_list, crop_size=(out_h, out_w),
                           scale=False, mirror=False)
    loader = batch_iterator(ds, 1, shuffle=False, drop_last=False)
    mean_iu, iu_array = evaluate_main(
        model, variables, loader, args.classes_num, out_size=(out_h, out_w),
        eval_type="val", output_dir=args.output_dir or None, whole=args.whole,
        scales=tuple(float(s) for s in args.scales.split(",")), flip=args.flip,
    )
    print(f"meanIU: {mean_iu:.6f}")
    print("IU_array:", np.array2string(iu_array, precision=4))
    return mean_iu


if __name__ == "__main__":
    main()
