"""Training entry point — counterpart of reference train_and_eval.py.

    python -m structure_knowledge_distillation_tpu.cli.train \
        --data-dir ../cityscapes --batch-size 8 --num-steps 40000 \
        --weight-decay 5e-4 --pi true --pa true --ho true \
        --lambda-pa 0.5 --pool-scale 0.5 --lambda-pi 10.0 --lambda-d 0.1

With --data-set synthetic no files are needed (smoke/benchmark runs).
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

from structure_knowledge_distillation_tpu.config import TrainConfig
from structure_knowledge_distillation_tpu.data import (
    CityscapesDataset,
    SyntheticSegDataset,
    batch_iterator,
    device_prefetch,
)
from structure_knowledge_distillation_tpu.training import checkpoint as ckpt_io
from structure_knowledge_distillation_tpu.training.trainer import KDTrainer
from structure_knowledge_distillation_tpu.utils import log_init

log = logging.getLogger(__name__)


def build_datasets(cfg: TrainConfig):
    if cfg.data_set != "synthetic":
        # reference-style default list paths (./dataset/list/<ds>/train.lst)
        # resolve by generating from the dataset tree on first use
        from structure_knowledge_distillation_tpu.data.lists import ensure_list

        cfg.data_list = ensure_list(cfg.data_set, cfg.data_dir, cfg.data_list)
        cfg.val_data_list = ensure_list(cfg.data_set, cfg.data_dir,
                                        cfg.val_data_list)
    if cfg.data_set == "synthetic":
        train = SyntheticSegDataset(
            length=cfg.num_steps * cfg.batch_size, crop_size=cfg.input_size,
            num_classes=cfg.classes_num, seed=cfg.seed,
        )
        val = SyntheticSegDataset(
            length=2, crop_size=cfg.input_size, num_classes=cfg.classes_num,
            seed=cfg.seed + 1,
        )
        return train, val
    if cfg.data_set == "camvid":
        # cfg.input_mean_bgr already holds the CamVid mean
        # (TrainConfig.__post_init__ derives it from data_set)
        from structure_knowledge_distillation_tpu.data import CamVidDataset
        train = CamVidDataset(
            cfg.data_dir, cfg.data_list, max_iters=cfg.num_steps * cfg.batch_size,
            crop_size=cfg.input_size, scale=cfg.random_scale,
            mirror=cfg.random_mirror, ignore_label=cfg.ignore_label, seed=cfg.seed,
        )
        val = CamVidDataset(
            cfg.data_dir, cfg.val_data_list, crop_size=(360, 480),
            scale=False, mirror=False, ignore_label=cfg.ignore_label,
        )
        return train, val
    if cfg.data_set == "voc":
        from structure_knowledge_distillation_tpu.data import VOCDataset

        train = VOCDataset(
            cfg.data_dir, cfg.data_list, max_iters=cfg.num_steps * cfg.batch_size,
            crop_size=cfg.input_size, scale=cfg.random_scale,
            mirror=cfg.random_mirror, ignore_label=cfg.ignore_label, seed=cfg.seed,
        )
        val = VOCDataset(
            cfg.data_dir, cfg.val_data_list, crop_size=(505, 505),
            scale=False, mirror=False, ignore_label=cfg.ignore_label,
        )
        return train, val
    if cfg.data_set in ("cityscape", "cityscapes"):
        train = CityscapesDataset(
            cfg.data_dir, cfg.data_list,
            max_iters=cfg.num_steps * cfg.batch_size,
            crop_size=cfg.input_size, scale=cfg.random_scale,
            mirror=cfg.random_mirror, ignore_label=cfg.ignore_label, seed=cfg.seed,
            cache_dir=cfg.decode_cache_dir or None,
        )
        val = CityscapesDataset(
            cfg.data_dir, cfg.val_data_list, crop_size=(1024, 2048),
            scale=False, mirror=False, ignore_label=cfg.ignore_label,
            cache_dir=cfg.decode_cache_dir or None,
        )
        return train, val
    raise ValueError(f"unknown data_set {cfg.data_set!r}")


def _resolve_snapshot(path: str, names=("model_best.pth.tar", "model_best.msgpack")):
    """An explicit checkpoint file, or `model_best.*` inside a directory
    (reference resumes from `<ckpt_path>/model_best.pth.tar`,
    utils/utils.py:109-110, :134-135)."""
    if os.path.isfile(path):
        return path
    if os.path.isfile(path + ".msgpack"):
        return path + ".msgpack"
    if os.path.isdir(path):
        for name in names:
            cand = os.path.join(path, name)
            if os.path.isfile(cand):
                return cand
    return None


def load_initial_variables(cfg: TrainConfig, trainer_cls=KDTrainer):
    """Teacher (required for distillation) and optional student/D weights."""
    teacher_vars = student_vars = d_vars = None
    if cfg.T_ckpt_path:
        import jax.numpy as jnp

        from structure_knowledge_distillation_tpu.models import teacher_model

        sd = ckpt_io.load_torch_state_dict(cfg.T_ckpt_path)
        model = teacher_model(num_classes=cfg.classes_num)
        dummy = jnp.zeros((1, *cfg.input_size, 3), jnp.float32)
        template = model.init(jax.random.PRNGKey(0), dummy, train=False)
        teacher_vars = ckpt_io.import_torch_respspnet(sd, template)
        log.info("loaded teacher from %s", cfg.T_ckpt_path)
    if cfg.D_resume:
        # reference load_D_model (utils/utils.py:130-151): restore the GAN
        # discriminator so a continued run keeps its adversarial state.
        path = _resolve_snapshot(cfg.D_ckpt_path)
        if path is None:
            log.info("D_resume: no checkpoint at %r", cfg.D_ckpt_path)
        else:
            import jax.numpy as jnp

            from structure_knowledge_distillation_tpu.models import Discriminator

            disc = Discriminator(preprocess_mode=cfg.preprocess_gan_mode,
                                 image_size=cfg.imsize_for_adv,
                                 conv_dim=cfg.adv_conv_dim)
            adv = cfg.imsize_for_adv
            template = disc.init(
                jax.random.PRNGKey(2),
                jnp.zeros((1, adv, adv, cfg.classes_num), jnp.float32),
                train=False)
            if path.endswith((".pth", ".pth.tar", ".tar")):
                sd, _ = ckpt_io.load_torch_checkpoint(path)
                d_vars = ckpt_io.import_torch_discriminator(sd, template)
            else:
                from flax import serialization

                with open(path, "rb") as f:
                    raw = serialization.msgpack_restore(f.read())
                if "d_params" in raw:  # a full KDTrainState snapshot
                    raw = {"params": raw["d_params"],
                           "batch_stats": raw.get("d_stats", {}),
                           "spectral": raw.get("d_spectral", {})}
                d_vars = serialization.from_state_dict(template, raw)
            log.info("loaded discriminator from %s", path)
    if cfg.is_student_load_imgnet and cfg.student_pretrain_model_imgnet:
        import jax.numpy as jnp

        from structure_knowledge_distillation_tpu.models import student_model

        sd = ckpt_io.load_torch_state_dict(cfg.student_pretrain_model_imgnet)
        model = student_model(num_classes=cfg.classes_num)
        dummy = jnp.zeros((1, *cfg.input_size, 3), jnp.float32)
        template = model.init(jax.random.PRNGKey(1), dummy, train=False)
        student_vars = ckpt_io.import_torch_respspnet(sd, template)
        log.info("loaded student ImageNet init from %s",
                 cfg.student_pretrain_model_imgnet)
    return teacher_vars, student_vars, d_vars


def main(argv=None):
    cfg = TrainConfig.from_args(argv)
    log_init(cfg.log_path, cfg.data_set)
    for key, val in vars(cfg).items():
        log.info("%s : %s", key, val)
    from structure_knowledge_distillation_tpu.utils import save_args

    save_args(cfg, f"{cfg.log_path}/args.txt")

    train_ds, val_ds = build_datasets(cfg)
    teacher_vars, student_vars, d_vars = load_initial_variables(cfg)
    trainer = KDTrainer(cfg, teacher_vars, student_vars, d_vars)
    if cfg.S_resume:
        # Explicit snapshot (S_ckpt_path file or its model_best.*) takes
        # precedence, restoring step/best_mean_IU + the lr-schedule offset
        # (reference utils/utils.py:108-127); otherwise auto-restore the
        # newest async checkpoint in snapshot_dir.
        snap = _resolve_snapshot(cfg.S_ckpt_path)
        if snap is not None:
            trainer.resume_from_snapshot(snap)
        else:
            trainer.try_resume()

    # Multi-controller pods (one process per host, jax.distributed
    # initialized by the launcher): every process draws the identical
    # shuffled order and loads only its slice of each global batch;
    # put_global assembles the logical global array from the local shards.
    host_iter = batch_iterator(train_ds, cfg.batch_size, shuffle=True,
                               seed=cfg.seed, num_workers=cfg.num_workers,
                               num_shards=jax.process_count(),
                               shard_index=jax.process_index())
    # A resumed/offset run trains only the REMAINING budget: the reference
    # loop is `range(num_steps - last_step)` after restoring
    # (train_and_eval.py:20-22, utils/utils.py:108-127). The dataset is
    # sized to num_steps batches, so without this bound a resumed run would
    # train num_steps MORE steps past the schedule's end (lr pinned at 0).
    resume_step = max(int(getattr(trainer, "start_step", 0)), cfg.last_step)
    if resume_step:
        import itertools

        host_iter = itertools.islice(
            host_iter, max(0, cfg.num_steps - resume_step))
    # narrow the host→device wire format (see cast_batches): bf16 images
    # match the model's own input cast; uint8 labels fit every supported
    # dataset (≤254 classes + ignore 255); --wire-format u8 re-quantizes
    # images to raw bytes (de-quantized on device with the dataset mean)
    from structure_knowledge_distillation_tpu.data import cast_batches

    image_dtype, image_mean = None, None
    if cfg.wire_format == "u8" and cfg.data_set != "synthetic":
        # synthetic images are not integer−mean; u8 would quantize them
        image_dtype = "uint8"
        image_mean = np.asarray(cfg.input_mean_bgr, np.float32)
    elif cfg.wire_format != "f32" and cfg.compute_dtype == "bfloat16":
        import ml_dtypes

        image_dtype = ml_dtypes.bfloat16
    label_dtype = ("uint8" if cfg.classes_num <= 254 and cfg.ignore_label <= 255
                   and cfg.wire_format != "f32" else None)
    if image_dtype is not None or label_dtype is not None:
        host_iter = cast_batches(host_iter, image_dtype, label_dtype,
                                 image_mean=image_mean)
    if trainer.unroll > 1:
        # Stack unroll-sized chunks on the host, then transfer once — the
        # scanned device loop consumes (unroll, B, ...) arrays directly.
        from structure_knowledge_distillation_tpu.data import chunk_batches
        from structure_knowledge_distillation_tpu.parallel import (
            stacked_batch_sharding,
        )

        sharding = (stacked_batch_sharding(trainer.mesh)
                    if trainer.mesh is not None else None)
        train_iter = device_prefetch(
            chunk_batches(host_iter, trainer.unroll), sharding=sharding)
    else:
        train_iter = device_prefetch(host_iter, sharding=trainer.batch_sharding)
    val_loader = lambda: batch_iterator(val_ds, 1, shuffle=False)

    if cfg.data_set == "synthetic":
        eval_out_size = cfg.input_size
    else:
        from structure_knowledge_distillation_tpu.data import DATASET_EVAL_DEFAULTS

        eval_out_size = DATASET_EVAL_DEFAULTS[cfg.data_set][0]
    best = trainer.fit(train_iter, val_loader, eval_out_size=eval_out_size)
    log.info("training done; best mean_IU %.4f", best)
    return best


if __name__ == "__main__":
    main()
