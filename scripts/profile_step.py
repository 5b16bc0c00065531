"""Capture a profiler trace of the FULL KD train step (bench.py config) and
print the top device ops — localizes the remaining step-time.

    python scripts/profile_step.py [--steps 5] [--out /tmp/step_trace]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir: str, steps: int, stem_s2d: bool = True):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    # reuse bench's model/step construction at the flagship config
    from structure_knowledge_distillation_tpu.config import TrainConfig
    from structure_knowledge_distillation_tpu.models import Discriminator, ResPSPNet
    from structure_knowledge_distillation_tpu.training import (
        create_train_state, make_sgd, make_train_step,
    )

    cfg = TrainConfig(classes_num=19, batch_size=8, input_size=(512, 512),
                      num_steps=40000, imsize_for_adv=65,
                      compute_dtype="bfloat16")
    dtype = jnp.bfloat16
    teacher = ResPSPNet(block="bottleneck", layers=(3, 4, 23, 3), num_classes=19,
                        dtype=dtype, stem_s2d=stem_s2d)
    student = ResPSPNet(block="basic", layers=(2, 2, 2, 2), num_classes=19,
                        dtype=dtype, stem_s2d=stem_s2d)
    disc = Discriminator(preprocess_mode=1, image_size=65, conv_dim=64, dtype=dtype)
    key = jax.random.PRNGKey(0)
    images = jax.random.normal(key, (8, 512, 512, 3), jnp.float32)
    labels = jax.random.randint(key, (8, 512, 512), 0, 19)
    t_shapes = jax.eval_shape(lambda: teacher.init(key, images[:1], train=False))
    t_vars = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), t_shapes)
    t_vars["batch_stats"] = jax.tree.map(jnp.ones_like, t_vars["batch_stats"])
    t_vars["params"] = jax.tree.map(
        lambda x: x + 0.01 if x.ndim == 4 else x, t_vars["params"])
    s_vars = student.init(key, images[:1], train=False)
    d_vars = disc.init(key, jnp.zeros((1, 65, 65, 19)), train=False)
    g_tx = make_sgd(cfg.lr_g, cfg.num_steps, cfg.power, cfg.momentum, cfg.weight_decay)
    d_tx = make_sgd(cfg.lr_d, cfg.num_steps, cfg.power, cfg.momentum, cfg.weight_decay)
    state = create_train_state(key, t_vars, s_vars, d_vars, g_tx, d_tx)
    step_fn = make_train_step(cfg, teacher, student, disc, g_tx, d_tx)
    unroll = int(os.environ.get("PROFILE_UNROLL", "0"))
    if unroll > 1:
        from structure_knowledge_distillation_tpu.training import make_train_loop

        loop = jax.jit(make_train_loop(step_fn, unroll), donate_argnums=(0,))
        images_k = jnp.broadcast_to(images, (unroll,) + images.shape)
        labels_k = jnp.broadcast_to(labels, (unroll,) + labels.shape)

        def step(state, images, labels):
            st, mk = loop(state, images_k, labels_k)
            return st, {"g_loss": mk["g_loss"][-1]}
    else:
        step = jax.jit(step_fn, donate_argnums=(0,))
    for _ in range(3):
        state, metrics = step(state, images, labels)
    float(np.asarray(metrics["g_loss"]))
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, metrics = step(state, images, labels)
    float(np.asarray(metrics["g_loss"]))
    jax.profiler.stop_trace()
    print("trace written to", out_dir)


def report(out_dir: str, steps: int, top: int = 30):
    import re

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{out_dir}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA Modules"):
                continue
            by_op = {}
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                own = name.split(" = ")[0]
                if "-start" in own or "-done" in own:
                    continue
                shape = re.search(r"= (\S+?)\{", name)
                key = f"{own} {shape.group(1) if shape else ''}"
                by_op[key] = by_op.get(key, 0) + ev.duration_ps
            print(f"--- {line.name}")
            for key2, ps in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
                print(f"{ps/(steps*1e9):8.3f} ms/step  {key2[:100]}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", default=5, type=int)
    p.add_argument("--out", default="/tmp/step_trace", type=str)
    p.add_argument("--report-only", action="store_true")
    p.add_argument("--no-stem-s2d", action="store_true",
                   help="profile the literal (pre-fold) stem layout")
    a = p.parse_args()
    if not a.report_only:
        capture(a.out, a.steps, stem_s2d=not a.no_stem_s2d)
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    report(a.out, a.steps)
