"""Inference-export entry point (TPU-native packaging; no reference
counterpart — the reference ships raw training state_dicts only).

    python -m structure_knowledge_distillation_tpu.cli.export \
        --checkpoint snapshots/CS_scenes_39999_0.75.msgpack \
        --output ./export/student_infer --fold-bn

Loads a trained ResPSPNet checkpoint (native .msgpack — raw variables or a
full trainer-state snapshot — or a torch .pth via the importer), optionally
folds the eval-mode ABN statistics into the conv kernels
(models/fold.py — use with `ResPSPNet(fold_bn=True)` at serving time),
verifies forward parity of the folded model on a random input, and writes a
native inference .msgpack (+ .json metadata). `--torch-output` additionally
emits a reference-compatible torch state_dict (unfolded — the torch model
keeps its BN modules; key surgery mirrors utils/utils.py:73-91).

`--stablehlo-output` additionally writes a SELF-CONTAINED serving artifact
via `jax.export`: one serialized StableHLO program with the weights baked in
as constants, loadable with `jax.export.deserialize(blob).call(image)` — no
model code, no checkpoint, no Python class needed at serving time. Both
modes take RAW (not mean-subtracted) BGR f32 images — the mean subtract is
inside the program: `classmap` returns the uint8 trainId map (forward,
align-corners resize, argmax — the evaluate.py fast path's semantics);
`logits` returns the stride-8 score maps.
"""

from __future__ import annotations

import argparse
import json
import logging
import os

log = logging.getLogger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help=".msgpack (variables or trainer state) or torch .pth")
    p.add_argument("--arch", default="resnet18",
                   choices=("resnet18", "resnet101"))
    p.add_argument("--classes-num", default=19, type=int)
    p.add_argument("--output", required=True,
                   help="output basename (writes <output>.msgpack + .json)")
    p.add_argument("--fold-bn", action="store_true",
                   help="fold eval-mode ABN into conv kernels (native only)")
    p.add_argument("--torch-output", default="",
                   help="also write a torch state_dict .pth (unfolded)")
    p.add_argument("--verify-size", default=128, type=int,
                   help="input side length for the fold parity check")
    p.add_argument("--stablehlo-output", default="",
                   help="also write a self-contained jax.export StableHLO "
                        "serving artifact to this path")
    p.add_argument("--stablehlo-size", default="1024,2048",
                   help="serving input H,W (static shapes)")
    p.add_argument("--stablehlo-batch", default=1, type=int)
    p.add_argument("--stablehlo-mode", default="classmap",
                   choices=("classmap", "logits"))
    p.add_argument("--stablehlo-dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="conv compute dtype inside the exported program")
    p.add_argument("--stablehlo-platforms", default="",
                   help="comma list (e.g. tpu,cpu); default: current backend")
    p.add_argument("--input-mean-bgr",
                   default="104.00698793,116.66876762,122.67891434",
                   help="BGR mean subtracted on-device in BOTH modes — the "
                        "exported program always takes RAW (unsubtracted) "
                        "images")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from structure_knowledge_distillation_tpu.models import (
        ResPSPNet,
        student_model,
        teacher_model,
    )
    from structure_knowledge_distillation_tpu.models.fold import fold_bn_variables
    from structure_knowledge_distillation_tpu.training import checkpoint as ckpt_io

    make = student_model if args.arch == "resnet18" else teacher_model
    model = make(num_classes=args.classes_num)
    s = args.verify_size
    dummy = jnp.zeros((1, s, s, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    if args.checkpoint.endswith((".pth", ".pth.tar", ".tar")):
        sd, _ = ckpt_io.load_torch_checkpoint(args.checkpoint)
        variables = ckpt_io.import_torch_respspnet(sd, variables)
    else:
        variables = ckpt_io.load_student_variables(args.checkpoint, variables)

    out_vars = variables
    max_diff = None
    if args.fold_bn:
        out_vars = fold_bn_variables(variables)
        folded_model = ResPSPNet(
            block=model.block, layers=tuple(model.layers),
            num_classes=args.classes_num, fold_bn=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, s, s, 3), jnp.float32)
        ref = model.apply(variables, x, train=False)[0].astype(jnp.float32)
        got = folded_model.apply(out_vars, x, train=False)[0].astype(jnp.float32)
        max_diff = float(jnp.abs(ref - got).max()
                         / jnp.maximum(jnp.abs(ref).max(), 1.0))
        log.info("fold parity: max relative logit diff = %.3e", max_diff)
        if max_diff > 1e-3:
            raise RuntimeError(f"BN folding parity check failed ({max_diff})")

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(out_vars)))
    meta = {"arch": args.arch, "classes_num": args.classes_num,
            "fold_bn": bool(args.fold_bn), "source": args.checkpoint}
    if max_diff is not None:
        meta["fold_max_logit_diff"] = max_diff
    with open(args.output + ".json", "w") as f:
        json.dump(meta, f)
    log.info("wrote %s.msgpack", args.output)

    if args.torch_output:
        import torch

        sd = ckpt_io.export_torch_respspnet(variables)
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                   args.torch_output)
        log.info("wrote torch state_dict %s", args.torch_output)

    if args.stablehlo_output:
        from jax import export as jexport

        from structure_knowledge_distillation_tpu.ops.resize import (
            resize_bilinear_align_corners,
        )

        h, w = (int(v) for v in args.stablehlo_size.split(","))
        dtype = jnp.bfloat16 if args.stablehlo_dtype == "bfloat16" else None
        serve_model = ResPSPNet(
            block=model.block, layers=tuple(model.layers),
            num_classes=args.classes_num, dtype=dtype,
            fold_bn=bool(args.fold_bn))
        serve_vars = jax.device_get(out_vars)
        mean = jnp.asarray(
            [float(v) for v in args.input_mean_bgr.split(",")], jnp.float32)

        def serve(image):
            """Raw BGR f32 image(s) in; weights are baked-in constants."""
            logits = serve_model.apply(serve_vars, image - mean,
                                       train=False)[0].astype(jnp.float32)
            if args.stablehlo_mode == "logits":
                return logits
            logits = resize_bilinear_align_corners(logits, (h, w))
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        platforms = ([s for s in args.stablehlo_platforms.split(",") if s]
                     or None)
        spec = jax.ShapeDtypeStruct((args.stablehlo_batch, h, w, 3),
                                    jnp.float32)
        exported = jexport.export(jax.jit(serve), platforms=platforms)(spec)
        blob = exported.serialize()
        with open(args.stablehlo_output, "wb") as f:
            f.write(blob)
        meta["stablehlo"] = {
            "path": args.stablehlo_output, "mode": args.stablehlo_mode,
            "input": list(spec.shape), "platforms": list(exported.platforms),
            "bytes": len(blob),
        }
        with open(args.output + ".json", "w") as f:
            json.dump(meta, f)
        log.info("wrote StableHLO serving artifact %s (%d bytes, %s)",
                 args.stablehlo_output, len(blob), exported.platforms)
    return args.output + ".msgpack"


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
