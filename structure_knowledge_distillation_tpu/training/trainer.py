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


def _enumerate_steps(chunks, first_step: int):
    """Pair each Chunk with the global index of its first (valid) step."""
    step = first_step
    for chunk in chunks:
        yield step, chunk
        step += chunk.n_valid


class KDTrainer:
    def __init__(self, cfg: TrainConfig, teacher_vars=None, student_vars=None,
                 d_vars=None):
        self.cfg = cfg
        dtype = _dtype_of(cfg.compute_dtype)

        # Fallback must track TrainConfig.stem_s2d's default (True): a
        # config-like object lacking the field (older saved args) would
        # otherwise silently train the non-default stem, diverging from the
        # bench/entrypoint configuration.
        stem_s2d = bool(getattr(cfg, "stem_s2d", True))
        self.teacher = ResPSPNet(
            block="bottleneck",
            layers=tuple(getattr(cfg, "teacher_layers", (3, 4, 23, 3))),
            num_classes=cfg.classes_num, dtype=dtype, stem_s2d=stem_s2d)
        if getattr(cfg, "student_arch", "resnet18") == "espnet":
            from structure_knowledge_distillation_tpu.models import ESPNetC

            if getattr(cfg, "remat", False):
                log.warning("--remat only applies to the ResPSPNet student; "
                            "ESPNet-C is shallow enough not to need it")
            self.student = ESPNetC(num_classes=cfg.classes_num, dtype=dtype)
        else:
            self.student = ResPSPNet(block="basic", layers=(2, 2, 2, 2),
                                     num_classes=cfg.classes_num, dtype=dtype,
                                     remat=bool(getattr(cfg, "remat", False)),
                                     stem_s2d=stem_s2d)
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

        flat = bool(getattr(cfg, "flat_sgd", False))
        self.g_tx = make_sgd(cfg.lr_g, cfg.num_steps, cfg.power, cfg.momentum,
                             cfg.weight_decay, flat=flat)
        self.d_tx = make_sgd(cfg.lr_d, cfg.num_steps, cfg.power, cfg.momentum,
                             cfg.weight_decay, flat=flat)
        self.state = create_train_state(rng, teacher_vars, student_vars, d_vars,
                                        self.g_tx, self.d_tx, last_step=cfg.last_step)

        num_slices = getattr(cfg, "num_slices", 1)
        num_spatial = getattr(cfg, "num_spatial_shards", 1)
        need = (cfg.num_data_shards * cfg.num_model_shards * num_slices
                * num_spatial)
        self.mesh = make_mesh(cfg.num_data_shards, cfg.num_model_shards,
                              num_slices=num_slices,
                              num_spatial=num_spatial) if need > 1 else None
        if self.mesh is not None:
            self.state = shard_state(self.state, self.mesh)
            self.batch_sharding = batch_sharding(self.mesh)
        else:
            self.batch_sharding = None

        step_fn = make_train_step(cfg, self.teacher, self.student,
                                  self.discriminator, self.g_tx, self.d_tx)
        self._step_fn = step_fn
        # On a mesh, PIN the output state's shardings to the input spec:
        # fit() feeds each dispatch the previous dispatch's output state, and
        # without out_shardings the output commits different shardings — the
        # second chunk re-lowers the whole program (a hidden multi-minute
        # compile mid-run; measured while budgeting dryrun_multichip).
        # Metrics are scalars (or (unroll,) stacks) — replicated.
        jit_kw = {}
        if self.mesh is not None:
            from structure_knowledge_distillation_tpu.parallel import (
                replicated,
                state_shardings,
            )

            jit_kw = dict(out_shardings=(
                state_shardings(self.state, self.mesh), replicated(self.mesh)))
        self.train_step = jax.jit(step_fn, donate_argnums=(0,), **jit_kw)
        self.unroll = max(1, int(getattr(cfg, "unroll_steps", 1)))
        if self.unroll > 1:
            from structure_knowledge_distillation_tpu.training.train_step import (
                make_train_loop,
            )

            self.train_loop = jax.jit(make_train_loop(step_fn, self.unroll),
                                      donate_argnums=(0,), **jit_kw)
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
            from flax import serialization

            msgpack_path = (path if path.endswith(".msgpack")
                            else path + ".msgpack")
            with open(msgpack_path, "rb") as f:
                raw = serialization.msgpack_restore(f.read())
            meta_path = msgpack_path[: -len(".msgpack")] + ".json"
            meta = {}
            if os.path.exists(meta_path):
                meta = ckpt.load_meta(path)
            if "student_params" in raw:  # full KDTrainState snapshot:
                # everything (step, opt counts, spectral) restores verbatim
                self.state = serialization.from_state_dict(self.state, raw)
                step = int(meta.get("state_step",
                                    meta.get("step", int(self.state.step))))
            else:
                # bare-student cadence snapshot (save_student_state):
                # weights-only resume — momentum buffers restart and the
                # step/schedule offset comes from the metadata, exactly
                # like resuming the reference's CS_scenes_*.pth state_dict
                variables = {"params": self.state.student_params,
                             "batch_stats": self.state.student_stats}
                merged = serialization.from_state_dict(variables, raw)
                step = int(meta.get("state_step", meta.get("step", 0)))
                self.state = self.state.replace(
                    step=jnp.asarray(step, jnp.int32),
                    student_params=merged["params"],
                    student_stats=merged["batch_stats"],
                    g_opt=_set_schedule_count(self.state.g_opt, step),
                    d_opt=_set_schedule_count(self.state.d_opt, step),
                )
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
        first_step = getattr(self, "start_step", cfg.last_step) + 1
        # profile window is relative to THIS run's first step, so resumed
        # runs still capture a trace; profile_active pairs every stop_trace
        # with a start_trace.
        profile_start = first_step + 9
        profile_active = False
        unroll = getattr(self, "unroll", 1)
        steps_since_log = 0

        def chunk_stream():
            """Yield `Chunk`s of `unroll` steps. Pre-chunked input (e.g. from
            cli.train's chunk_batches→device_prefetch pipeline, which stacks
            on the host before the single device transfer) passes through;
            per-step batches are stacked here. The tail chunk is padded to
            full length with `n_valid` marking the real steps, so the ONE
            compiled loop program serves every chunk (no tail recompile)."""
            from structure_knowledge_distillation_tpu.data.prefetch import (
                Chunk,
                chunk_batches,
            )

            def gen():
                buf = []
                for b in train_iter:
                    if isinstance(b, Chunk):
                        if buf:
                            raise ValueError(
                                "mixed per-step batches and Chunks in train_iter")
                        yield b
                        continue
                    buf.append(b)
                    if len(buf) == unroll:
                        yield from chunk_batches(iter(buf), unroll)
                        buf = []
                if buf:
                    yield from chunk_batches(iter(buf), unroll)

            return gen()

        def run_chunk(chunk):
            """Dispatch one device-loop chunk; returns (n_valid, metrics_k)."""
            images_k, labels_k, n_valid = chunk
            if (self.batch_sharding is not None
                    and not hasattr(images_k, "sharding")):
                from structure_knowledge_distillation_tpu.parallel import (
                    stacked_batch_sharding,
                )

                from structure_knowledge_distillation_tpu.data.prefetch import (
                    put_global,
                )

                sh = stacked_batch_sharding(self.mesh)
                images_k = put_global(images_k, sh)
                labels_k = put_global(labels_k, sh)
            valid_k = np.arange(unroll) < n_valid
            self.state, metrics_k = self.train_loop(
                self.state, images_k, labels_k, valid_k)
            return n_valid, metrics_k

        if unroll > 1:
            groups = ((start, *run_chunk(chunk)) for start, chunk in
                      _enumerate_steps(chunk_stream(), first_step))
        else:
            def per_step_groups():
                step = first_step
                for batch in train_iter:
                    images, labels = batch[0], batch[1]
                    if (self.batch_sharding is not None
                            and not hasattr(images, "sharding")):
                        from structure_knowledge_distillation_tpu.data.prefetch import (
                            put_global,
                        )

                        images = put_global(images, self.batch_sharding)
                        labels = put_global(labels, self.batch_sharding)
                    self.state, metrics = self.train_step(
                        self.state, images, labels)
                    yield step, 1, jax.tree.map(lambda m: m[None], metrics)
                    step += 1

            groups = per_step_groups()

        # Graceful preemption (production TPU jobs receive SIGTERM before
        # eviction; the reference loses everything since its last cadence
        # snapshot, train_and_eval.py:27-30): checkpoint at the next step
        # boundary, then return. Rerunning with the same snapshot_dir
        # auto-resumes via try_resume/restore_latest.
        import signal

        self._preempt_requested = False

        def _on_sigterm(signum, frame):
            self._preempt_requested = True
            log.info("SIGTERM: checkpointing at the next step boundary")

        try:
            prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not the main thread (fit() driven from a worker)
            prev_sigterm = None

        try:
            best = self._fit_loop(groups, cfg, val_loader, eval_out_size,
                                  writer, best, t_last, steps_since_log,
                                  profile_dir, profile_start, profile_active)
        finally:
            if prev_sigterm is not None:
                signal.signal(signal.SIGTERM, prev_sigterm)
        if writer is not None:
            writer.close()
        from structure_knowledge_distillation_tpu.training import checkpoint as ckpt

        ckpt.wait_for_saves()  # drain async checkpoints before returning
        return best

    def _fit_loop(self, groups, cfg, val_loader, eval_out_size, writer, best,
                  t_last, steps_since_log, profile_dir, profile_start,
                  profile_active):
        for start, n_valid, metrics_k in groups:
            end = start + n_valid - 1
            if (profile_dir and not profile_active
                    and start <= profile_start <= end):
                jax.profiler.start_trace(profile_dir)
                profile_active = True
            steps_since_log += n_valid
            if profile_active and end >= profile_start + cfg.profile_steps:
                jax.device_get(metrics_k)
                jax.profiler.stop_trace()
                profile_active = False
                log.info("profiler trace written to %s", profile_dir)
                profile_dir = ""

            log_hits = [s for s in range(start, end + 1)
                        if s % cfg.log_every == 0]
            if log_hits:
                ms = jax.device_get(
                    jax.tree.map(lambda v: v[:n_valid], metrics_k))
                dt = time.time() - t_last
                ips = steps_since_log * cfg.batch_size / max(dt, 1e-9)
                t_last = time.time()
                steps_since_log = 0
                for step_idx in log_hits:
                    m = {k: v[step_idx - start] for k, v in ms.items()}
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
                self.save_checkpoint(step_idx, mean_iu, is_best=mean_iu > best,
                                     state_step=end)
                best = max(best, mean_iu)

            if self._preempt_requested:
                from structure_knowledge_distillation_tpu.training import (
                    checkpoint as ckpt,
                )

                ckpt.save_state_async(self._orbax_dir, self.state, step=end)
                ckpt.wait_for_saves()
                log.info(
                    "preempted: full state saved at step %d to %s; rerun "
                    "with --S_resume true and the same snapshot_dir to "
                    "auto-resume", end, self._orbax_dir)
                break
        return best

    # ------------------------------------------------------------------- eval
    def evaluate(self, val_loader: Iterable, out_size=(1024, 2048), whole=True):
        variables = {
            "params": self.state.student_params,
            "batch_stats": self.state.student_stats,
        }
        # u8 image wire for the val sweep: exact for unscaled/unpadded
        # integer−mean val frames (cityscapes 1024×2048, camvid 360×480).
        # VOC pads to (505,505) and synthetic images are not integer-valued,
        # so both keep the f32 wire.
        input_mean = None
        if (getattr(self.cfg, "wire_format", "auto") != "f32"
                and getattr(self.cfg, "data_set", "")
                in ("cityscapes", "cityscape", "camvid")):
            input_mean = np.asarray(
                getattr(self.cfg, "input_mean_bgr",
                        (104.00698793, 116.66876762, 122.67891434)),
                np.float32)
        # published-eval-mode in-training validation: cfg.scales/cfg.flip
        # (reference evaluate.py:115-134 multiscale+flip semantics) thread
        # through BOTH the sharded and single-device paths, so `--scales
        # 0.75,1.0,1.25 --flip` validates the same way `cli.eval` reports.
        scales = tuple(getattr(self.cfg, "scales", (1.0,)) or (1.0,))
        flip = bool(getattr(self.cfg, "flip", False))
        if whole and self.mesh is not None:
            # shard the val sweep over the data axis: n_data images per
            # dispatch, confusion matrices all-reduced on device
            from structure_knowledge_distillation_tpu.training.evaluate import (
                evaluate_sharded,
            )

            n_data = 1
            for axis in ("dcn", "data"):
                n_data *= self.mesh.shape.get(axis, 1)
            if n_data > 1:
                return evaluate_sharded(
                    self.student, variables, val_loader, self.cfg.classes_num,
                    out_size=out_size, batch=n_data,
                    sharding=self.batch_sharding,
                    ignore_label=self.cfg.ignore_label,
                    input_mean=input_mean,
                    scales=scales, flip=flip,
                )
        return evaluate_main(
            self.student, variables, val_loader, self.cfg.classes_num,
            out_size=out_size, eval_type="val", whole=whole,
            ignore_label=self.cfg.ignore_label,
            input_mean=input_mean,
            scales=scales, flip=flip,
        )

    # ------------------------------------------------------------------- ckpt
    def save_checkpoint(self, step: int, mean_iu: float, is_best: bool = False,
                        state_step: Optional[int] = None):
        """`step` is the eval-cadence step (the reference's filename
        convention, kd_model.py:192); under the device loop the saved state
        may be up to unroll-1 steps newer — `state_step` records the actual
        state.step in the metadata so resume bookkeeping is unambiguous."""
        from structure_knowledge_distillation_tpu.training import checkpoint as ckpt

        os.makedirs(self.cfg.snapshot_dir, exist_ok=True)
        state_step = int(state_step if state_step is not None else step)
        path = os.path.join(self.cfg.snapshot_dir, f"CS_scenes_{step}_{mean_iu}")
        # cadence snapshot = bare student variables (reference semantics,
        # kd_model.py:192); model_best below keeps the FULL state for resume
        ckpt.save_student_state(path, self.state, step=step, mean_iu=mean_iu,
                                state_step=state_step)
        if is_best:
            # model_best copy in S_ckpt_path, the path load_S_model-style
            # resume reads (reference utils/utils.py:153-157, :108-110)
            best_dir = self.cfg.S_ckpt_path or self.cfg.snapshot_dir
            os.makedirs(best_dir, exist_ok=True)
            ckpt.save_state(os.path.join(best_dir, "model_best"), self.state,
                            step=step, mean_iu=mean_iu, state_step=state_step)
        # async step-indexed checkpoint for auto-resume (try_resume); labeled
        # with the TRUE state step (under the device loop the state is up to
        # unroll-1 steps past the cadence hit) so resume never re-feeds
        # already-consumed steps
        ckpt.save_state_async(self._orbax_dir, self.state, step=state_step)
        return path
