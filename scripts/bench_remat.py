"""Measure the HBM effect of `--remat` via AOT compile + memory_analysis.

Compiles the full Pi+Pa+Ho train step (R101 teacher, R18 student, 512² crops)
with and without per-block student rematerialization and reports XLA's
temp-buffer (activation/workspace) sizes. AOT only — nothing executes, so
configurations larger than the chip's HBM still report their footprint,
which is exactly the point: remat is the knob that brings bigger
batches/crops under the 16 GB v5e budget.

Usage: python scripts/bench_remat.py [--size 512] [batch ...]
       (default: size 512, batches 8 32 64)
"""

from __future__ import annotations

import sys


def analyze(batch_size: int, remat: bool, image_size: int = 512):
    import jax
    import jax.numpy as jnp

    from structure_knowledge_distillation_tpu.config import TrainConfig
    from structure_knowledge_distillation_tpu.models import (
        Discriminator,
        ResPSPNet,
    )
    from structure_knowledge_distillation_tpu.training import (
        create_train_state,
        make_sgd,
        make_train_step,
    )

    dtype = jnp.bfloat16
    logits_hw = image_size // 8 + 1  # ceil-stem rule: 512² → 65, 1024² → 129
    cfg = TrainConfig(
        classes_num=19, batch_size=batch_size,
        input_size=(image_size, image_size), num_steps=40000,
        pi=True, pa=True, ho=True, adv_loss_type="wgan-gp",
        imsize_for_adv=logits_hw, compute_dtype="bfloat16", remat=remat,
    )
    teacher = ResPSPNet(block="bottleneck", layers=(3, 4, 23, 3),
                        num_classes=19, dtype=dtype)
    student = ResPSPNet(block="basic", layers=(2, 2, 2, 2), num_classes=19,
                        dtype=dtype, remat=remat)
    disc = Discriminator(preprocess_mode=1, image_size=logits_hw, conv_dim=64,
                         dtype=dtype)
    g_tx = make_sgd(cfg.lr_g, cfg.num_steps, cfg.power, cfg.momentum,
                    cfg.weight_decay)
    d_tx = make_sgd(cfg.lr_d, cfg.num_steps, cfg.power, cfg.momentum,
                    cfg.weight_decay)

    key = jax.random.PRNGKey(0)
    img1 = jax.ShapeDtypeStruct((1, image_size, image_size, 3), jnp.float32)
    d_in = jax.ShapeDtypeStruct((1, logits_hw, logits_hw, 19), jnp.float32)

    def mk_state():
        t_vars = teacher.init(key, jnp.zeros(img1.shape, img1.dtype),
                              train=False)
        s_vars = student.init(key, jnp.zeros(img1.shape, img1.dtype),
                              train=False)
        d_vars = disc.init(key, jnp.zeros(d_in.shape, d_in.dtype), train=False)
        return create_train_state(key, t_vars, s_vars, d_vars, g_tx, d_tx)

    state_struct = jax.eval_shape(mk_state)
    images = jax.ShapeDtypeStruct(
        (batch_size, image_size, image_size, 3), jnp.float32)
    labels = jax.ShapeDtypeStruct(
        (batch_size, image_size, image_size), jnp.int32)

    step_fn = make_train_step(cfg, teacher, student, disc, g_tx, d_tx)
    compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(
        state_struct, images, labels).compile()
    ma = compiled.memory_analysis()
    return {
        "temp_gib": ma.temp_size_in_bytes / 2**30,
        "args_gib": ma.argument_size_in_bytes / 2**30,
        "out_gib": ma.output_size_in_bytes / 2**30,
        "alias_gib": ma.alias_size_in_bytes / 2**30,
    }


def main(batches, size=512):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/sskd_jax_cache")
    except Exception:
        pass
    print(f"backend={jax.default_backend()}  "
          f"full Pi+Pa+Ho step, R101→R18, {size}², bf16", flush=True)
    print(f"{'batch':>5} {'remat':>5} {'temp GiB':>9} {'args GiB':>9} "
          f"{'out GiB':>8} {'live≈ GiB':>9}")
    for b in batches:
        for remat in (False, True):
            r = analyze(b, remat, image_size=size)
            live = r["temp_gib"] + r["args_gib"]  # donated args alias output
            print(f"{b:>5} {str(remat):>5} {r['temp_gib']:>9.2f} "
                  f"{r['args_gib']:>9.2f} {r['out_gib']:>8.2f} {live:>9.2f}",
                  flush=True)


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _wait_for_tpu

    args = sys.argv[1:]
    size = 512
    if "--size" in args:
        i = args.index("--size")
        size = int(args[i + 1])
        del args[i:i + 2]
    _wait_for_tpu()
    main([int(a) for a in args] or [8, 32, 64], size=size)
