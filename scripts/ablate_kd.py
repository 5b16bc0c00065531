"""Controlled "KD helps" ablation — the mechanism check behind the
reference's headline table (reference README.md:33-36: mIoU 69.10 no-KD →
+Pi 70.51 → +Pi+Pa 71.78 → +Pi+Pa+Ho 72.68 on Cityscapes val).

The real experiment is environment-blocked (no Cityscapes data, no released
checkpoints), so this runs the same FOUR-ARM design at toy scale: a fixed
synthetic-but-LEARNABLE segmentation task (smooth class fields → argmax
labels; images are ambiguous class colors + heavy pixel noise, so soft
teacher posteriors carry real information beyond the hard labels), a
higher-capacity teacher trained with a much larger budget, then four
students from identical inits/data under the same short budget:

    none       mc (CE+DSN) only
    pi         + lambda_pi  * pixel-wise KL            (losses/distill.py)
    pi+pa      + lambda_pa  * pairwise affinity        (losses/distill.py)
    pi+pa+ho   + lambda_d   * holistic adversarial     (losses/adversarial.py)

Each arm is the PRODUCTION train program (make_train_step under the cfg
booleans — not a lambda-zeroed stand-in), repeated over seeds; val mIoU per
arm comes from the device eval path (make_fast_val_batch_fn). Direction is
the claim at this scale, not magnitude — a toy task cannot reproduce
Cityscapes deltas, only show the distillation terms move a student the way
the reference measured.

    python scripts/ablate_kd.py [--arm-steps 300] [--teacher-steps 1200]
                                [--seeds 0,1] [--out /tmp/ablate_kd.json]

Everything (data generation included) runs on device; host↔device traffic
is metrics-only, so the run is compile-dominated through the axon relay.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZE = 256          # smallest resolution with valid SAGAN D geometry (os8=33)
CLASSES = 6
BATCH = 8
UNROLL = 10
FIELD_RES = 16      # class fields upsampled FIELD_RES -> SIZE (blob scale)
NOISE_SIGMA = 90.0  # vs palette separation ~60: boundaries genuinely ambiguous
VAL_IMAGES = 64


def _palette() -> np.ndarray:
    """(C,3) class colors in mean-subtracted BGR range, with deliberately
    CLOSE pairs (0,1) and (2,3): dark knowledge is about relative class
    similarity, so the toy task needs confusable classes."""
    return np.array(
        [
            [-80.0, -80.0, 60.0],
            [-60.0, -80.0, 60.0],   # close to 0
            [60.0, -20.0, -80.0],
            [60.0, 0.0, -60.0],     # close to 2
            [-20.0, 90.0, 20.0],
            [90.0, 60.0, -20.0],
        ],
        np.float32,
    )[:CLASSES]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--teacher-steps", default=1200, type=int)
    p.add_argument("--arm-steps", default=300, type=int)
    p.add_argument("--train-chunks", default=0, type=int,
                   help="if >0, the four arms train on a FIXED pool of this "
                        "many data chunks (UNROLL*BATCH images each), cycled "
                        "as epochs — the reference's actual regime "
                        "(Cityscapes: 2975 images x 40k steps x batch 8 = "
                        "~107 epochs of reuse) where the teacher's extra "
                        "information regularizes an overfitting student. "
                        "0 = every chunk fresh (infinite stream).")
    p.add_argument("--seeds", default="0,1", type=str)
    p.add_argument("--out", default="/tmp/ablate_kd.json", type=str)
    p.add_argument("--state-dir", default="/tmp/ablate_kd_state", type=str,
                   help="resume cache: trained teacher + per-(arm,seed) "
                        "results land here so a relay failure mid-run only "
                        "costs the interrupted leg on relaunch")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (tiny smoke runs only)")
    a = p.parse_args()
    seeds = [int(s) for s in a.seeds.split(",")]
    os.makedirs(a.state_dir, exist_ok=True)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sskd_jax_cache")

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import _wait_for_tpu

        _wait_for_tpu()

    import jax.numpy as jnp

    from structure_knowledge_distillation_tpu.config import TrainConfig
    from structure_knowledge_distillation_tpu.models import (
        Discriminator,
        ResPSPNet,
    )
    from structure_knowledge_distillation_tpu.training import (
        create_train_state,
        make_sgd,
        make_train_loop,
        make_train_step,
    )
    from structure_knowledge_distillation_tpu.training.evaluate import (
        iu_from_confusion,
        make_fast_val_batch_fn,
    )

    on_tpu = jax.default_backend() == "tpu"
    palette = jnp.asarray(_palette())

    # ---- toy task, generated ON DEVICE (no host wire): smooth per-class
    # fields -> argmax labels; image = class color + iid noise.
    def gen_batch(key, batch):
        kf, kn = jax.random.split(key)
        fields = jax.random.normal(
            kf, (batch, FIELD_RES, FIELD_RES, CLASSES), jnp.float32)
        fields = jax.image.resize(
            fields, (batch, SIZE, SIZE, CLASSES), "bilinear")
        labels = jnp.argmax(fields, axis=-1).astype(jnp.int32)
        noise = NOISE_SIGMA * jax.random.normal(
            kn, (batch, SIZE, SIZE, 3), jnp.float32)
        images = palette[labels] + noise
        return images, labels

    @jax.jit
    def gen_chunk(key):
        keys = jax.random.split(key, UNROLL)
        return jax.vmap(lambda k: gen_batch(k, BATCH))(keys)

    def data_key(seed: int, chunk: int):
        # Arms share the stream per seed: the key depends on (seed, chunk)
        # only, so every arm sees byte-identical batches.
        return jax.random.fold_in(jax.random.PRNGKey(7000 + seed), chunk)

    def make_cfg(pi: bool, pa: bool, ho: bool, num_steps: int) -> TrainConfig:
        return TrainConfig(
            data_set="synthetic", classes_num=CLASSES, batch_size=BATCH,
            input_size=(SIZE, SIZE), num_steps=num_steps,
            pi=pi, pa=pa, ho=ho,
            # reference run-script weights (run_train_val.sh / SURVEY §2)
            lambda_pi=10.0, lambda_pa=0.5, lambda_d=0.1, pool_scale=0.5,
            imsize_for_adv=33, adv_conv_dim=16,
            compute_dtype="bfloat16" if on_tpu else "float32",
            fused_ce="true" if on_tpu else "false",
        )

    # Jitted loops memoized per arm: seeds share one compiled program.
    _loops: dict = {}

    def build(cfg: TrainConfig, student, teacher, t_vars, seed: int,
              arm: str):
        key = jax.random.PRNGKey(seed)
        ks, kd, kst = jax.random.split(key, 3)
        dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
        s_vars = student.init(ks, dummy, train=False)
        disc = Discriminator(preprocess_mode=cfg.preprocess_gan_mode,
                             image_size=cfg.imsize_for_adv,
                             conv_dim=cfg.adv_conv_dim,
                             dtype=jnp.bfloat16 if on_tpu else None)
        d_vars = disc.init(
            kd, jnp.zeros((1, 33, 33, CLASSES), jnp.float32), train=False)
        g_tx = make_sgd(cfg.lr_g, cfg.num_steps, cfg.power, cfg.momentum,
                        cfg.weight_decay)
        d_tx = make_sgd(cfg.lr_d, cfg.num_steps, cfg.power, cfg.momentum,
                        cfg.weight_decay)
        # The loop donates the whole state, which holds the teacher params
        # BY REFERENCE — without a device-side copy, the first donated call
        # of one arm deletes the shared teacher buffers out from under every
        # later arm/seed (hit for real: seed 1 raised InvalidArgument at the
        # first fetch).
        state = create_train_state(kst, jax.tree.map(jnp.copy, t_vars),
                                   s_vars, d_vars, g_tx, d_tx)
        if arm not in _loops:
            step_fn = make_train_step(cfg, teacher, student, disc, g_tx, d_tx)
            _loops[arm] = jax.jit(
                make_train_loop(step_fn, UNROLL), donate_argnums=(0,))
        return state, _loops[arm]

    # Fence every K chunks: without this, all dispatches queue async and a
    # hung relay only surfaces at the end-of-leg fetch ~20 min later (hit
    # for real: attempt 1 of the TPU run sat silent 30+ min mid-pretrain).
    FENCE_EVERY = 20

    def train(state, loop, steps: int, seed: int, tag: str = "",
              train_chunks: int = 0):
        last = None
        n_chunks = steps // UNROLL
        for chunk in range(n_chunks):
            # train_chunks>0 = finite pool cycled as epochs (arms only);
            # val keys live at 10**6+, so the pool never leaks into eval.
            data_chunk = chunk % train_chunks if train_chunks else chunk
            images_k, labels_k = gen_chunk(data_key(seed, data_chunk))
            state, metrics_k = loop(state, images_k, labels_k)
            last = metrics_k
            if (chunk + 1) % FENCE_EVERY == 0 and chunk + 1 < n_chunks:
                g = float(np.asarray(last["g_loss"])[-1])
                print(f"[ablate +{time.perf_counter()-t0:6.1f}s]   {tag}"
                      f" chunk {chunk+1}/{n_chunks} g_loss {g:.4f}",
                      flush=True)
        # value fetch = the only reliable fence on the axon relay
        g_final = float(np.asarray(last["g_loss"])[-1])
        return state, g_final

    # ONE jitted val program per model (a fresh jax.jit per evaluate() call
    # would recompile ~1 min on-chip each time — CLAUDE.md quirks).
    _val_fns: dict = {}

    def evaluate(model, variables, seed_offset: int = 10**6):
        if id(model) not in _val_fns:
            _val_fns[id(model)] = make_fast_val_batch_fn(
                model, (SIZE, SIZE), CLASSES, ignore_label=255)
        val_fn = _val_fns[id(model)]
        hs = jnp.full((BATCH,), SIZE, jnp.int32)
        ws = jnp.full((BATCH,), SIZE, jnp.int32)
        conf = np.zeros((CLASSES, CLASSES), np.int64)
        for i in range(VAL_IMAGES // BATCH):
            images, labels = gen_batch(
                jax.random.fold_in(jax.random.PRNGKey(seed_offset), i), BATCH)
            _, c = val_fn(variables, images, labels, hs, ws)
            conf += np.asarray(c).astype(np.int64)
        mean_iu, _ = iu_from_confusion(conf)
        return float(mean_iu)

    t0 = time.perf_counter()
    results: dict = {
        "task": {"size": SIZE, "classes": CLASSES, "batch": BATCH,
                 "noise_sigma": NOISE_SIGMA, "field_res": FIELD_RES,
                 "val_images": VAL_IMAGES},
        "teacher_steps": a.teacher_steps, "arm_steps": a.arm_steps,
        "train_chunks": a.train_chunks,
        "seeds": seeds, "backend": jax.default_backend(),
    }

    # ---- 1) teacher pretrain: higher capacity (bottleneck), long budget,
    # plain task loss (pi=pa=ho off; the unused reference-teacher forward is
    # dead code XLA eliminates). The trained teacher is cached in state-dir:
    # the axon relay has killed this run mid-flight twice, and the pretrain
    # is the single most expensive leg (~9 min), so relaunches reload it.
    from flax import serialization

    t_dtype = jnp.bfloat16 if on_tpu else None
    teacher = ResPSPNet(block="bottleneck", layers=(1, 1, 1, 1),
                        num_classes=CLASSES, dtype=t_dtype)
    t_shapes = jax.eval_shape(
        lambda: teacher.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, SIZE, SIZE, 3), jnp.float32),
                             train=False))
    dummy_t_vars = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), t_shapes)
    t_tag = f"{jax.default_backend()}_s{a.teacher_steps}"
    t_ckpt = os.path.join(a.state_dir, f"teacher_{t_tag}.msgpack")
    t_meta = os.path.join(a.state_dir, f"teacher_{t_tag}.json")
    if os.path.exists(t_ckpt) and os.path.exists(t_meta):
        with open(t_ckpt, "rb") as f:
            t_vars = serialization.from_bytes(dummy_t_vars, f.read())
        with open(t_meta) as f:
            results["teacher"] = json.load(f)
        print(f"[ablate +{time.perf_counter()-t0:6.1f}s] teacher resumed "
              f"from {t_ckpt} (val mIoU "
              f"{results['teacher']['val_mean_iu']:.4f})", flush=True)
    else:
        print(f"[ablate +{time.perf_counter()-t0:6.1f}s] teacher pretrain "
              f"({a.teacher_steps} steps) ...", flush=True)
        cfg_t = make_cfg(pi=False, pa=False, ho=False,
                         num_steps=a.teacher_steps)
        # zero-shaped teacher vars: the reference-teacher forward is traced
        # but unused under pi=pa=ho=False, so XLA dead-code-eliminates it —
        # the zeros only have to satisfy flax's param-tree check, never run
        state_t, loop_t = build(cfg_t, teacher, teacher, dummy_t_vars,
                                seed=999, arm="teacher")
        state_t, t_loss = train(state_t, loop_t, a.teacher_steps, seed=999,
                                tag="teacher")
        t_vars = {"params": state_t.student_params,
                  "batch_stats": state_t.student_stats}
        teacher_miou = evaluate(teacher, t_vars)
        results["teacher"] = {"final_loss": t_loss,
                              "val_mean_iu": teacher_miou}
        with open(t_ckpt, "wb") as f:
            f.write(serialization.to_bytes(t_vars))
        with open(t_meta, "w") as f:
            json.dump(results["teacher"], f)
        print(f"[ablate +{time.perf_counter()-t0:6.1f}s] teacher val mIoU "
              f"{teacher_miou:.4f} (loss {t_loss:.4f})", flush=True)

    # ---- 2) four arms x seeds, identical data/budget.
    arms = [
        ("none", dict(pi=False, pa=False, ho=False)),
        ("pi", dict(pi=True, pa=False, ho=False)),
        ("pi+pa", dict(pi=True, pa=True, ho=False)),
        ("pi+pa+ho", dict(pi=True, pa=True, ho=True)),
    ]
    student = ResPSPNet(block="basic", layers=(1, 1, 1, 1),
                        num_classes=CLASSES, dtype=t_dtype)
    results["arms"] = {}
    for name, flags in arms:
        cfg = make_cfg(num_steps=a.arm_steps, **flags)
        mious, losses = [], []
        for seed in seeds:
            # resumable leg: a finished (arm, seed) is loaded, not re-run
            tc_tag = f"_tc{a.train_chunks}" if a.train_chunks else ""
            leg = os.path.join(
                a.state_dir,
                f"arm_{name}_{seed}_{t_tag}_a{a.arm_steps}{tc_tag}.json")
            if os.path.exists(leg):
                with open(leg) as f:
                    rec = json.load(f)
                miou, loss = rec["val_mean_iu"], rec["final_loss"]
                print(f"[ablate +{time.perf_counter()-t0:6.1f}s] arm "
                      f"{name:<9} seed {seed}: resumed val mIoU {miou:.4f}",
                      flush=True)
            else:
                state, loop = build(cfg, student, teacher, t_vars, seed=seed,
                                    arm=name)
                state, loss = train(state, loop, a.arm_steps, seed=seed,
                                    tag=f"{name}/s{seed}",
                                    train_chunks=a.train_chunks)
                s_vars = {"params": state.student_params,
                          "batch_stats": state.student_stats}
                miou = evaluate(student, s_vars)
                with open(leg, "w") as f:
                    json.dump({"val_mean_iu": miou, "final_loss": loss}, f)
                print(f"[ablate +{time.perf_counter()-t0:6.1f}s] arm "
                      f"{name:<9} seed {seed}: val mIoU {miou:.4f} "
                      f"(loss {loss:.4f})", flush=True)
            mious.append(miou)
            losses.append(loss)
        results["arms"][name] = {
            "val_mean_iu": mious,
            "mean": float(np.mean(mious)),
            "spread": float(np.max(mious) - np.min(mious)),
            "final_loss": losses,
        }

    results["wall_s"] = round(time.perf_counter() - t0, 1)
    with open(a.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
