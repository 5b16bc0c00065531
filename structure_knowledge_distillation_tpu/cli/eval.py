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
from structure_knowledge_distillation_tpu.data import batch_iterator
from structure_knowledge_distillation_tpu.training import checkpoint as ckpt_io
from structure_knowledge_distillation_tpu.training.evaluate import evaluate_main

from structure_knowledge_distillation_tpu.data import (
    DATASET_EVAL_DEFAULTS as _DATASET_DEFAULTS,
)


def _build_val_dataset(data_set: str, data_dir: str, data_list: str, size):
    if data_set in ("cityscape", "cityscapes"):
        from structure_knowledge_distillation_tpu.data import CityscapesDataset

        return CityscapesDataset(data_dir, data_list, crop_size=size,
                                 scale=False, mirror=False)
    if data_set == "voc":
        from structure_knowledge_distillation_tpu.data import VOCDataset

        return VOCDataset(data_dir, data_list, crop_size=size,
                          scale=False, mirror=False)
    if data_set == "camvid":
        from structure_knowledge_distillation_tpu.data import CamVidDataset

        return CamVidDataset(data_dir, data_list, crop_size=size,
                             scale=False, mirror=False)
    raise ValueError(f"unknown data_set {data_set!r}")


def build_student(arch: str, num_classes: int):
    if arch == "espnet":
        from structure_knowledge_distillation_tpu.models import ESPNetC

        return ESPNetC(num_classes=num_classes)
    from structure_knowledge_distillation_tpu.models import student_model

    return student_model(num_classes=num_classes)


def main(argv=None):
    p = argparse.ArgumentParser(description="val-set mIoU evaluation (TPU)")
    p.add_argument("--data-set", default="cityscapes", type=str,
                   choices=sorted(_DATASET_DEFAULTS))
    p.add_argument("--data-dir", default="", type=str)
    p.add_argument("--data-list", default="dataset/list/cityscapes/val.lst", type=str)
    p.add_argument("--resume-from", default="", type=str)
    p.add_argument("--classes_num", default=0, type=int,
                   help="0 = dataset default (19/21/11)")
    p.add_argument("--student-arch", default="resnet18", type=str,
                   choices=("resnet18", "espnet"))
    p.add_argument("--output-dir", default="", type=str)
    p.add_argument("--whole", default=True, type=str2bool)
    p.add_argument("--flip", default=False, type=str2bool)
    p.add_argument("--scales", default="1.0", type=str)
    p.add_argument("--eval-size", default="", type=str,
                   help="H,W; empty = dataset default")
    p.add_argument("--tile-size", default="512,512", type=str,
                   help="H,W sliding tile for --whole false (reference "
                        "input_size, networks/evaluate.py:163)")
    p.add_argument("--num-data-shards", default=1, type=int,
                   help=">1: shard the val sweep over a data mesh "
                        "(one image per device per dispatch, confusion "
                        "all-reduced on device; whole-image modes incl. "
                        "multiscale+flip)")
    p.add_argument("--num-spatial-shards", default=1, type=int,
                   help=">1: shard each image's HEIGHT across devices (XLA "
                        "halo exchange) — exact whole-image inference whose "
                        "memory divides by the device count; the TPU-native "
                        "replacement for --whole false tiling")
    args = p.parse_args(argv)
    default_size, default_classes = _DATASET_DEFAULTS[args.data_set]
    out_h, out_w = (map(int, args.eval_size.split(","))
                    if args.eval_size else default_size)
    num_classes = args.classes_num or default_classes

    model = build_student(args.student_arch, num_classes)
    dummy = jnp.zeros((1, out_h, out_w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    if args.resume_from.endswith(".msgpack"):
        variables = ckpt_io.load_student_variables(args.resume_from, variables)
    elif args.resume_from:
        sd = ckpt_io.load_torch_state_dict(args.resume_from)
        variables = ckpt_io.import_torch_respspnet(sd, variables)

    from structure_knowledge_distillation_tpu.data.lists import ensure_list

    data_list = ensure_list(args.data_set, args.data_dir, args.data_list)
    ds = _build_val_dataset(args.data_set, args.data_dir, data_list,
                            (out_h, out_w))
    loader = batch_iterator(ds, 1, shuffle=False, drop_last=False)
    scales = tuple(float(s) for s in args.scales.split(","))
    if (args.num_spatial_shards > 1 and args.whole and scales == (1.0,)
            and not args.flip and not args.output_dir):
        from structure_knowledge_distillation_tpu.parallel import make_mesh
        from structure_knowledge_distillation_tpu.training.evaluate import (
            evaluate_spatial,
        )

        mesh = make_mesh(num_data=args.num_spatial_shards, num_model=1)
        mean_iu, iu_array = evaluate_spatial(
            model, variables, loader, num_classes, out_size=(out_h, out_w),
            mesh=mesh,
        )
    elif (args.num_data_shards > 1 and args.whole and not args.output_dir):
        from structure_knowledge_distillation_tpu.parallel import (
            batch_sharding,
            make_mesh,
        )
        from structure_knowledge_distillation_tpu.training.evaluate import (
            evaluate_sharded,
        )

        mesh = make_mesh(num_data=args.num_data_shards, num_model=1)
        mean_iu, iu_array = evaluate_sharded(
            model, variables, loader, num_classes, out_size=(out_h, out_w),
            batch=args.num_data_shards, sharding=batch_sharding(mesh),
            scales=scales, flip=args.flip,
        )
    else:
        if args.num_spatial_shards > 1 or args.num_data_shards > 1:
            # don't let the user believe the sweep was sharded
            import logging

            logging.getLogger(__name__).warning(
                "shard flags ignored: spatial sharding supports only the "
                "whole-image single-scale sweep and data sharding only "
                "whole-image modes, both without --output-dir; running "
                "single-device")
        mean_iu, iu_array = evaluate_main(
            model, variables, loader, num_classes, out_size=(out_h, out_w),
            eval_type="val", output_dir=args.output_dir or None,
            whole=args.whole,
            tile_size=tuple(map(int, args.tile_size.split(","))),
            scales=scales, flip=args.flip,
        )
    print(f"meanIU: {mean_iu:.6f}")
    print("IU_array:", np.array2string(iu_array, precision=4))
    return mean_iu


if __name__ == "__main__":
    main()
