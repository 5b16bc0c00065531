"""KDTrainer — builds models/optimizers/mesh, owns the jitted step and eval.

Counterpart of reference networks/kd_model.py `NetModel` + the loop in
train_and_eval.py:20-30, re-shaped for TPU: one jitted train step (donated
state), batch sharded over the `data` mesh axis, host→device double-buffered
prefetch, and the reference's eval/checkpoint cadence.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from structure_knowledge_distillation_tpu.config import TrainConfig
from structure_knowledge_distillation_tpu.models import Discriminator, ResPSPNet
from structure_knowledge_distillation_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_state,
)
from structure_knowledge_distillation_tpu.training.evaluate import evaluate_main
from structure_knowledge_distillation_tpu.training.train_state import (
    create_train_state,
    make_sgd,
    poly_schedule,
)
from structure_knowledge_distillation_tpu.training.train_step import make_train_step

__all__ = ["KDTrainer"]

log = logging.getLogger(__name__)


def _dtype_of(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": None}.get(name, None)


class KDTrainer:
    def __init__(self, cfg: TrainConfig, teacher_vars=None, student_vars=None,
                 d_vars=None):
        self.cfg = cfg
        dtype = _dtype_of(cfg.compute_dtype)

        self.teacher = ResPSPNet(
            block="bottleneck",
            layers=tuple(getattr(cfg, "teacher_layers", (3, 4, 23, 3))),
            num_classes=cfg.classes_num, dtype=dtype)
        if getattr(cfg, "student_arch", "resnet18") == "espnet":
            from structure_knowledge_distillation_tpu.models import ESPNetC

            self.student = ESPNetC(num_classes=cfg.classes_num, dtype=dtype)
        else:
            self.student = ResPSPNet(block="basic", layers=(2, 2, 2, 2),
                                     num_classes=cfg.classes_num, dtype=dtype)
        self.discriminator = Discriminator(
            preprocess_mode=cfg.preprocess_gan_mode,
            image_size=cfg.imsize_for_adv,
            conv_dim=cfg.adv_conv_dim,
            dtype=dtype,
        )

        rng = jax.random.PRNGKey(cfg.seed)
        rng, kt, ks, kd = jax.random.split(rng, 4)
        h, w = cfg.input_size
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        if teacher_vars is None:
            teacher_vars = jax.eval_shape(
                lambda: self.teacher.init(kt, dummy, train=False)
            )
            teacher_vars = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), teacher_vars
            )
            log.warning("teacher initialized with zeros — load a real checkpoint "
                        "for distillation (cfg.T_ckpt_path)")
        if student_vars is None:
            student_vars = self.student.init(ks, dummy, train=False)
        if d_vars is None:
            adv = cfg.imsize_for_adv
            d_vars = self.discriminator.init(
                kd, jnp.zeros((1, adv, adv, cfg.classes_num), jnp.float32), train=False
            )

        self.g_tx = make_sgd(cfg.lr_g, cfg.num_steps, cfg.power, cfg.momentum,
                             cfg.weight_decay)
        self.d_tx = make_sgd(cfg.lr_d, cfg.num_steps, cfg.power, cfg.momentum,
                             cfg.weight_decay)
        self.state = create_train_state(rng, teacher_vars, student_vars, d_vars,
                                        self.g_tx, self.d_tx, last_step=cfg.last_step)

        num_slices = getattr(cfg, "num_slices", 1)
        self.mesh = make_mesh(cfg.num_data_shards, cfg.num_model_shards,
                              num_slices=num_slices) \
            if cfg.num_data_shards * cfg.num_model_shards * num_slices > 1 else None
        if self.mesh is not None:
            self.state = shard_state(self.state, self.mesh)
            self.batch_sharding = batch_sharding(self.mesh)
        else:
            self.batch_sharding = None

        step_fn = make_train_step(cfg, self.teacher, self.student,
                                  self.discriminator, self.g_tx, self.d_tx)
        self._step_fn = step_fn
        self.train_step = jax.jit(step_fn, donate_argnums=(0,))
        self.unroll = max(1, int(getattr(cfg, "unroll_steps", 1)))
        if self.unroll > 1:
            from structure_knowledge_distillation_tpu.training.train_step import (
                make_train_loop,
            )

            self.train_loop = jax.jit(make_train_loop(step_fn, self.unroll),
                                      donate_argnums=(0,))
        self.g_sched = poly_schedule(cfg.lr_g, cfg.num_steps, cfg.power)
        self.d_sched = poly_schedule(cfg.lr_d, cfg.num_steps, cfg.power)

    # ----------------------------------------------------------------- resume
    @property
    def _orbax_dir(self) -> str:
        return os.path.join(self.cfg.snapshot_dir, "orbax")

    def try_resume(self) -> int:
        """Restore the newest async checkpoint (crash/elastic recovery —
        the reference could only resume from explicit snapshots,
        utils/utils.py:108-127). Returns the restored step (0 if none)."""
        from structure_knowledge_distillation_tpu.training import checkpoint as ckpt

        if not os.path.isdir(self._orbax_dir):
            return 0
        restored, step = ckpt.restore_latest(self._orbax_dir, self.state)
        if restored is None:
            return 0
        self.state = restored
        if self.mesh is not None:
            self.state = shard_state(self.state, self.mesh)
        self.start_step = int(step)
        log.info("resumed from step %d (%s)", step, self._orbax_dir)
        return int(step)

    def resume_from_snapshot(self, path: str) -> int:
        """Resume from an EXPLICIT snapshot, restoring step + best_mean_IU and
        advancing the poly-lr schedule count (reference load_S_model reads
        step/best_mean_IU from model_best.pth.tar and offsets the loop:
        utils/utils.py:108-127, train_and_eval.py:21).

        Accepts a native full-state `.msgpack` (optimizer state included) or a
        torch `.pth[.tar]` student checkpoint (weights only — momentum buffers
        restart, as in the reference whose snapshots are bare state_dicts,
        kd_model.py:192)."""
        from structure_knowledge_distillation_tpu.training import checkpoint as ckpt
        from structure_knowledge_distillation_tpu.training.train_state import (
            _set_schedule_count,
        )

        best = 0.0
        if path.endswith((".pth", ".pth.tar", ".tar")):
            sd, meta = ckpt.load_torch_checkpoint(path)
            variables = {"params": self.state.student_params,
                         "batch_stats": self.state.student_stats}
            merged = ckpt.import_torch_respspnet(sd, variables)
            step = int(meta.get("step") or 0)
            best = float(meta.get("best_mean_IU") or 0.0)
            self.state = self.state.replace(
                step=jnp.asarray(step, jnp.int32),
                student_params=merged["params"],
                student_stats=merged["batch_stats"],
                g_opt=_set_schedule_count(self.state.g_opt, step),
                d_opt=_set_schedule_count(self.state.d_opt, step),
            )
        else:
            self.state = ckpt.restore_state(path, self.state)
            meta_path = (path if path.endswith(".msgpack") else path + ".msgpack")
            meta_path = meta_path[: -len(".msgpack")] + ".json"
            meta = {}
            if os.path.exists(meta_path):
                meta = ckpt.load_meta(path)
            step = int(meta.get("step", int(self.state.step)))
            best = float(meta.get("mean_iu", 0.0))
        if self.mesh is not None:
            self.state = shard_state(self.state, self.mesh)
        self.start_step = step
        self.cfg.best_mean_IU = max(self.cfg.best_mean_IU, best)
        log.info("resumed from snapshot %s (step %d, best_mean_IU %.4f)",
                 path, step, best)
        return step

    # ------------------------------------------------------------------ train
    def fit(self, train_iter: Iterable, val_loader: Optional[Iterable] = None,
            eval_out_size=(1024, 2048)):
        cfg = self.cfg
        best = cfg.best_mean_IU
        t_last = time.time()
        writer = None
        if cfg.log_path:
            from structure_knowledge_distillation_tpu.utils import MetricsWriter

            writer = MetricsWriter(cfg.log_path)
        profile_dir = getattr(cfg, "profile_dir", "")
        profile_start = 10
        first_step = getattr(self, "start_step", cfg.last_step) + 1
        unroll = getattr(self, "unroll", 1)
        steps_since_log = 0

        def chunks():
            """Yield (first_step_idx, [batch, ...]) groups of `unroll` steps
            (the tail group may be shorter and falls back to per-step calls)."""
            buf, start = [], first_step
            for b in train_iter:
                buf.append(b)
                if len(buf) == unroll:
                    yield start, buf
                    start += len(buf)
                    buf = []
            if buf:
                yield start, buf

        for start, batch_list in chunks():
            end = start + len(batch_list) - 1
            if profile_dir and start <= profile_start <= end:
                jax.profiler.start_trace(profile_dir)
            metrics_k = None
            if unroll > 1 and len(batch_list) == unroll:
                # device loop: one dispatch runs `unroll` steps via lax.scan
                images_k = np.stack([np.asarray(b[0]) for b in batch_list])
                labels_k = np.stack([np.asarray(b[1]) for b in batch_list])
                if self.batch_sharding is not None:
                    from structure_knowledge_distillation_tpu.parallel import (
                        stacked_batch_sharding,
                    )

                    sh = stacked_batch_sharding(self.mesh)
                    images_k = jax.device_put(images_k, sh)
                    labels_k = jax.device_put(labels_k, sh)
                self.state, metrics_k = self.train_loop(
                    self.state, images_k, labels_k)
                metrics = jax.tree.map(lambda m: m[-1], metrics_k)
            else:
                per_step = []
                for batch in batch_list:
                    images, labels = batch[0], batch[1]
                    if self.batch_sharding is not None and not hasattr(images, "sharding"):
                        images = jax.device_put(images, self.batch_sharding)
                        labels = jax.device_put(labels, self.batch_sharding)
                    self.state, metrics = self.train_step(self.state, images, labels)
                    per_step.append(metrics)
                if len(per_step) > 1:
                    metrics_k = jax.tree.map(lambda *ms: jnp.stack(ms), *per_step)
            steps_since_log += len(batch_list)
            if profile_dir and end >= profile_start + cfg.profile_steps:
                jax.device_get(metrics)
                jax.profiler.stop_trace()
                log.info("profiler trace written to %s", profile_dir)
                profile_dir = ""

            log_hits = [s for s in range(start, end + 1) if s % cfg.log_every == 0]
            if log_hits:
                step_idx = log_hits[-1]
                m = metrics
                if metrics_k is not None and step_idx != end:
                    m = jax.tree.map(lambda v: v[step_idx - start], metrics_k)
                m = jax.device_get(m)
                dt = time.time() - t_last
                ips = steps_since_log * cfg.batch_size / max(dt, 1e-9)
                t_last = time.time()
                steps_since_log = 0
                log.info(
                    "step:%5d G_lr:%.6f G_loss:%.5f (mc:%.5f pi:%.5f pa:%.5f) "
                    "D_lr:%.6f D_loss:%.5f img/s:%.2f",
                    step_idx, float(self.g_sched(step_idx)),
                    float(m.get("g_loss", 0.0)),
                    float(m.get("mc_loss", 0.0)),
                    float(m.get("pi_loss", 0.0)),
                    float(m.get("pa_loss", 0.0)),
                    float(self.d_sched(step_idx)),
                    float(m.get("d_loss", 0.0)), ips,
                )
                if writer is not None:
                    scalars = {k: float(v) for k, v in m.items()}
                    scalars["img_per_sec"] = ips
                    scalars["g_lr"] = float(self.g_sched(step_idx))
                    writer.write(step_idx, scalars)

            eval_hits = [s for s in range(start, end + 1) if cfg.should_eval(s)]
            if val_loader is not None and eval_hits:
                # with unroll > 1 the eval state is post-chunk (≤ unroll-1
                # steps after the cadence hit); step attribution keeps the hit
                step_idx = eval_hits[-1]
                # accept a factory so repeated evals get a fresh iterator
                loader = val_loader() if callable(val_loader) else val_loader
                mean_iu, iu_array = self.evaluate(loader, eval_out_size)
                log.info("[val] step %d mean_IU: %.6f IU_array: %s",
                         step_idx, mean_iu, np.array2string(iu_array, precision=4))
                if writer is not None:
                    writer.write(step_idx, {"val_mean_iu": mean_iu})
                self.save_checkpoint(step_idx, mean_iu, is_best=mean_iu > best)
                best = max(best, mean_iu)
        if writer is not None:
            writer.close()
        from structure_knowledge_distillation_tpu.training import checkpoint as ckpt

        ckpt.wait_for_saves()  # drain async checkpoints before returning
        return best

    # ------------------------------------------------------------------- eval
    def evaluate(self, val_loader: Iterable, out_size=(1024, 2048), whole=True):
        variables = {
            "params": self.state.student_params,
            "batch_stats": self.state.student_stats,
        }
        return evaluate_main(
            self.student, variables, val_loader, self.cfg.classes_num,
            out_size=out_size, eval_type="val", whole=whole,
            ignore_label=self.cfg.ignore_label,
        )

    # ------------------------------------------------------------------- ckpt
    def save_checkpoint(self, step: int, mean_iu: float, is_best: bool = False):
        from structure_knowledge_distillation_tpu.training import checkpoint as ckpt

        os.makedirs(self.cfg.snapshot_dir, exist_ok=True)
        path = os.path.join(self.cfg.snapshot_dir, f"CS_scenes_{step}_{mean_iu}")
        ckpt.save_state(path, self.state, step=step, mean_iu=mean_iu)
        if is_best:
            # model_best copy in S_ckpt_path, the path load_S_model-style
            # resume reads (reference utils/utils.py:153-157, :108-110)
            best_dir = self.cfg.S_ckpt_path or self.cfg.snapshot_dir
            os.makedirs(best_dir, exist_ok=True)
            ckpt.save_state(os.path.join(best_dir, "model_best"), self.state,
                            step=step, mean_iu=mean_iu)
        # async step-indexed checkpoint for auto-resume (try_resume)
        ckpt.save_state_async(self._orbax_dir, self.state, step=step)
        return path
