"""Benchmark: full Pi+Pa+Ho KD train-step throughput on one TPU chip.

Measures the flagship recipe — PSPNet-R101 teacher forward + R18 student
fwd/bwd with DSN+Pi+Pa+Ho losses + SAGAN-D step with WGAN-GP — at the
reference's training configuration (batch 8, 512² crops,
run_train_val.sh:8-16), on synthetic data (device-resident, so the number is
pure train-step throughput).

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec/chip, "unit": ..., "vs_baseline": ...}

Baseline: BASELINE.json carries no published throughput (reference hardware
undocumented). We use an estimate of the PyTorch reference recipe re-run on
one A100: ~22 img/s (R101 no-grad fwd ≈ 0.53 TF/img + R18 train ≈ 3×0.12
TF/img + 3×D fwd/bwd + GP double-backward at f32/TF32, data-loader bound).
vs_baseline = value / 22.0. The driver's north star is vs_baseline ≥ 2.

The JSON also carries an ABSOLUTE metric independent of that estimate:
  "mfu": flops_per_step / step_time / chip bf16 peak,
with flops_per_step from a structural conv+dot count of the traced step
jaxpr (2 flops per MAC — the standard MFU convention; see
utils/flops.py for why XLA's own cost analysis cannot be the numerator on
TPU) and the peak from the device_kind table below. The train program is
AOT-compiled (lower→compile) — identical executable through the shared
persistent cache — so XLA's cost analysis is also emitted as a cross-check
field without a second compile.
"""

from __future__ import annotations

import json
import time

BASELINE_IMG_PER_SEC = 22.0

# Dense bf16 peak FLOP/s per chip, keyed by jax device_kind. v5e ("TPU v5
# lite"): 197 TFLOP/s bf16 (Google Cloud TPU v5e spec). Unknown kinds emit
# mfu: null rather than a wrong number.
_PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def main(batch_size: int = 8, image_size: int = 512, warmup: int = 40,
         steps: int = 80, compute_dtype: str = "bfloat16",
         pi: bool = True, pa: bool = True, ho: bool = True,
         teacher_layers=(3, 4, 23, 3), unroll: int = 40,
         flat_sgd: bool = False, remat: bool = False,
         stem_s2d: bool = True) -> dict:
    # stem_s2d defaults ON: measured same-session pair on v5e (round 4) —
    # plain 152.53, s2d 153.32/153.45 img/s/chip (+0.6%, reproducible;
    # within-session s2d spread 0.13). Exact parity (grads + param tree).
    import jax

    # Persistent compile cache: the full-recipe step takes ~6-7 min to
    # compile through the axon relay; cached recompiles take seconds.
    # (Verified functional through the relay — entries are written and hit.)
    # Deliberately NOT host-fingerprinted (unlike the CPU caches in
    # utils/compile_cache.py): these are TPU executables, independent of the
    # host CPU's ISA, and the dryrun/tests no longer share this directory.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/sskd_jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    from structure_knowledge_distillation_tpu.config import TrainConfig
    from structure_knowledge_distillation_tpu.models import Discriminator, ResPSPNet
    from structure_knowledge_distillation_tpu.training import (
        create_train_state,
        make_sgd,
        make_train_loop,
        make_train_step,
    )

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    cfg = TrainConfig(
        classes_num=19, batch_size=batch_size,
        input_size=(image_size, image_size), num_steps=40000,
        pi=pi, pa=pa, ho=ho, adv_loss_type="wgan-gp",
        imsize_for_adv=65, compute_dtype=compute_dtype, remat=remat,
    )
    teacher = ResPSPNet(block="bottleneck", layers=tuple(teacher_layers),
                        num_classes=19, dtype=dtype, stem_s2d=stem_s2d)
    student = ResPSPNet(block="basic", layers=(2, 2, 2, 2), num_classes=19,
                        dtype=dtype, remat=remat, stem_s2d=stem_s2d)
    disc = Discriminator(preprocess_mode=1, image_size=65, conv_dim=64, dtype=dtype)

    key = jax.random.PRNGKey(0)
    images = jax.random.normal(key, (batch_size, image_size, image_size, 3), jnp.float32)
    labels = jax.random.randint(key, (batch_size, image_size, image_size), 0, 19)

    def zeros_like_shapes(tree):
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tree)

    # Parameter content doesn't affect throughput; avoid a huge host-side init.
    t_shapes = jax.eval_shape(lambda: teacher.init(key, images[:1], train=False))
    t_vars = zeros_like_shapes(t_shapes)
    t_vars["batch_stats"] = jax.tree.map(jnp.ones_like, t_vars["batch_stats"])
    t_vars["params"] = jax.tree.map(
        lambda x: x + 0.01 if x.ndim == 4 else x, t_vars["params"])
    # NOTE: keep these inits EAGER. Jitting them was tried and makes the
    # end-to-end bench slower and high-variance through the relay (their
    # one-off compiles dwarf the eager dispatch cost; measured 14-15+ min
    # vs 6.7-8 min total).
    s_vars = student.init(key, images[:1], train=False)
    logits_hw = 65 if image_size == 512 else image_size // 8 + 1
    d_vars = disc.init(key, jnp.zeros((1, logits_hw, logits_hw, 19)), train=False)

    g_tx = make_sgd(cfg.lr_g, cfg.num_steps, cfg.power, cfg.momentum,
                    cfg.weight_decay, flat=flat_sgd)
    d_tx = make_sgd(cfg.lr_d, cfg.num_steps, cfg.power, cfg.momentum,
                    cfg.weight_decay, flat=flat_sgd)
    state = create_train_state(key, t_vars, s_vars, d_vars, g_tx, d_tx)

    step_fn = make_train_step(cfg, teacher, student, disc, g_tx, d_tx)

    import numpy as np

    # Device-side multi-step loop (lax.scan over `unroll` microbatches per
    # dispatch) — amortizes the per-step launch overhead exactly the way a
    # production infeed loop does. unroll=1 falls back to one dispatch/step.
    # AOT (lower→compile) rather than plain jit: identical executable (the
    # persistent compile cache is shared), but the compiled object exposes
    # cost_analysis() for the MFU computation below.
    if unroll > 1:
        images_k = jnp.broadcast_to(images, (unroll,) + images.shape)
        labels_k = jnp.broadcast_to(labels, (unroll,) + labels.shape)
        loop = jax.jit(make_train_loop(step_fn, unroll), donate_argnums=(0,)) \
            .lower(state, images_k, labels_k).compile()

        def step(state, images, labels):
            new_state, metrics_k = loop(state, images_k, labels_k)
            return new_state, {"g_loss": metrics_k["g_loss"][-1]}

        compiled = loop
        steps = max(1, steps // unroll)
        warmup = max(1, warmup // unroll)
    else:
        step = jax.jit(step_fn, donate_argnums=(0,)) \
            .lower(state, images, labels).compile()
        compiled = step

    # FLOPs/step for MFU: a structural conv+dot count (2 flops per MAC) of
    # the traced single-step jaxpr — NOT compiled.cost_analysis(), whose
    # TPU 'flops' omits convolutions (convs lower to custom calls; it
    # reports ~160 GF where the conv+dot sum is ~7 TF on this step). XLA's
    # number is still emitted as a cross-check field.
    from structure_knowledge_distillation_tpu.utils.flops import flops_of_fn

    try:
        flops_per_step = flops_of_fn(step_fn, state, images, labels)
    except Exception:
        flops_per_step = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        xla_flops_per_step = float(cost["flops"]) / max(unroll, 1)
    except Exception:
        xla_flops_per_step = None

    # NOTE: on the axon relay, block_until_ready does not force execution —
    # a value fetch does. Materialize a scalar to fence the timed region.
    for _ in range(warmup):
        state, metrics = step(state, images, labels)
    float(np.asarray(metrics["g_loss"]))

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, images, labels)
    g_loss = float(np.asarray(metrics["g_loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(g_loss)

    imgs_per_sec = batch_size * steps * max(unroll, 1) / dt
    n_chips = max(len(jax.devices()), 1)
    per_chip = imgs_per_sec / n_chips

    # MFU: flops/step ÷ fenced step time ÷ chip bf16 peak — the absolute
    # perf metric (independent of the estimated A100 denominator above).
    step_time_s = dt / (steps * max(unroll, 1))
    device_kind = jax.devices()[0].device_kind
    peak = _PEAK_BF16_FLOPS.get(device_kind)
    mfu = (round(flops_per_step / step_time_s / peak, 4)
           if flops_per_step and peak else None)
    return {
        "metric": "cityscapes_512_kd_train_images_per_sec_per_chip",
        "value": round(per_chip, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC, 3),
        # Self-describing provenance: the reference publishes NO throughput
        # (README.md has only mIoU tables) and no A100 exists in this
        # environment, so the denominator is an ESTIMATE of the PyTorch
        # recipe re-run on one A100 (see module docstring) — not a
        # measurement. Config fields pin what this number means.
        "baseline_denominator": "estimated",
        "baseline_img_per_sec": BASELINE_IMG_PER_SEC,
        "baseline_note": "estimated PyTorch reference on 1xA100 (no published throughput)",
        # Absolute complement to vs_baseline: measured on THIS chip with no
        # estimated quantity involved (XLA cost analysis of the timed
        # executable / fenced step time / device peak).
        "mfu": mfu,
        "flops_per_step": flops_per_step,
        "flops_source": "analytic_jaxpr_conv_dot" if flops_per_step else None,
        # XLA's own cost analysis of the timed executable, for the record —
        # on TPU it omits conv flops (custom calls), hence not used for MFU.
        "xla_flops_per_step": xla_flops_per_step,
        "step_time_ms": round(step_time_s * 1e3, 3),
        "device_kind": device_kind,
        "peak_bf16_flops": peak,
        "config": {"batch": batch_size, "image_size": image_size,
                   "unroll": unroll, "dtype": compute_dtype, "remat": remat,
                   "stem_s2d": stem_s2d},
    }


def _wait_for_tpu(max_tries: int = 10, probe_timeout_s: int = 180,
                  retry_wait_s: int = 150,
                  probe_code: str = "import jax; jax.devices()") -> None:
    """Ride out transient relay outages before committing to the run.

    The axon tunnel occasionally refuses (UNAVAILABLE) or hangs backend
    init; once that happens in-process, jax caches the failed backend, so
    the probe runs in a SUBPROCESS (with a timeout for the hang case) and
    this process only imports jax after a probe succeeds. On persistent
    failure, fall through and let the real run raise its own error.
    (`probe_code` probes the environment's default platform — the preset
    sitecustomize imports jax before env vars apply; tests override it.)"""
    import subprocess
    import sys

    for attempt in range(max_tries):
        try:
            subprocess.run(
                [sys.executable, "-c", probe_code],
                check=True, timeout=probe_timeout_s,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return
        except Exception:
            if attempt == max_tries - 1:
                return  # let main() surface the real error
            print(f"TPU probe failed (attempt {attempt + 1}/{max_tries}); "
                  f"retrying in {retry_wait_s}s", file=sys.stderr)
            time.sleep(retry_wait_s)


if __name__ == "__main__":
    import argparse

    # argparse (not substring checks) so a stale or typoed flag fails loudly
    # instead of silently benchmarking the default configuration.
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--flat-sgd", action="store_true",
                    help="flattened single-vector SGD (recorded negative)")
    ap.add_argument("--remat", action="store_true",
                    help="student per-block rematerialization (memory mode)")
    ap.add_argument("--no-stem-s2d", action="store_true",
                    help="revert the space-to-depth folded stem (default on)")
    ap.add_argument("--unroll-steps", type=int, default=40,
                    help="device-loop scan length per dispatch")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--warmup", type=int, default=40)
    args = ap.parse_args()

    _wait_for_tpu()
    print(json.dumps(main(batch_size=args.batch_size,
                          image_size=args.image_size,
                          warmup=args.warmup, steps=args.steps,
                          unroll=args.unroll_steps,
                          flat_sgd=args.flat_sgd, remat=args.remat,
                          stem_s2d=not args.no_stem_s2d)))
