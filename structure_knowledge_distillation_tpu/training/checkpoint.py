"""Checkpoint save/restore + PyTorch checkpoint import/export.

Native checkpoints are msgpack-serialized full train states (flax
serialization) with a JSON sidecar (step / mean_IU / best), replacing the
reference's bare `state_dict` snapshots (reference networks/kd_model.py:192,
utils/utils.py:153-157).

The torch importers perform the reference's key surgery (reference
utils/utils.py:73-151): released-teacher `head.0.*`→`pspmodule.*`,
`head.1.*`→`head.*` remap, `module.` prefix strip, `fc` drop — plus the
layout conversion this framework needs: OIHW conv weights → HWIO, BN
running_mean/running_var → batch_stats mean/var. Import is by
key-intersection with shape check (the reference student loaded ImageNet
weights the same way, utils/utils.py:98-103).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization, traverse_util

__all__ = [
    "save_state",
    "restore_state",
    "map_torch_key",
    "import_torch_respspnet",
    "export_torch_respspnet",
    "map_torch_discriminator_key",
    "import_torch_discriminator",
    "export_torch_discriminator",
    "load_torch_state_dict",
    "load_torch_checkpoint",
]

log = logging.getLogger(__name__)


# --------------------------------------------------------------------- orbax
_async_mgr = None
_async_mgr_dir = None


def save_state_async(directory: str, state, step: int, keep: int = 3) -> None:
    """Async Orbax checkpointing (reference had none — crash = rerun; see
    SURVEY.md §5). Saves proceed in the background; call `wait_for_saves()`
    (or let the next save barrier) before reading the files."""
    global _async_mgr, _async_mgr_dir
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if _async_mgr is None or _async_mgr_dir != directory:
        if _async_mgr is not None:
            _async_mgr.wait_until_finished()
        options = ocp.CheckpointManagerOptions(max_to_keep=keep,
                                               enable_async_checkpointing=True)
        _async_mgr = ocp.CheckpointManager(directory, options=options)
        _async_mgr_dir = directory
    if step in _async_mgr.all_steps():
        # idempotent per step: a preemption save landing in the same chunk as
        # an eval-cadence save would otherwise raise StepAlreadyExistsError
        # (the state at a given step is identical — nothing to add)
        return
    _async_mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))


def wait_for_saves() -> None:
    if _async_mgr is not None:
        _async_mgr.wait_until_finished()


def restore_latest(directory: str, state_template):
    """Restore the newest async checkpoint in `directory` (auto-resume)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    mgr = ocp.CheckpointManager(directory)
    step = mgr.latest_step()
    if step is None:
        return None, None
    restored = mgr.restore(step, args=ocp.args.StandardRestore(
        jax.device_get(state_template)))
    return restored, step


# --------------------------------------------------------------------- native
def save_state(path: str, state, **meta) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    with open(path + ".json", "w") as f:
        json.dump({k: float(v) if isinstance(v, (int, float, np.floating)) else v
                   for k, v in meta.items()}, f)
    return path + ".msgpack"


def save_student_state(path: str, state, **meta) -> str:
    """Reference-style cadence snapshot: bare student variables + JSON meta.

    The reference's per-eval `CS_scenes_{step}_{mIoU}.pth` is the student's
    state_dict alone (kd_model.py:192-193) — no teacher, no optimizer.
    Saving the full KDTrainState there ships/stores the frozen R101 teacher
    (~5× the bytes) for nothing; full-state saves remain for `model_best`
    (exact resume) and the async Orbax stream (crash recovery).
    `load_student_variables` and weights-only `resume_from_snapshot` read
    this format."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tree = {"params": jax.device_get(state.student_params),
            "batch_stats": jax.device_get(state.student_stats)}
    with open(path + ".msgpack", "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(tree)))
    with open(path + ".json", "w") as f:
        json.dump({k: float(v) if isinstance(v, (int, float, np.floating)) else v
                   for k, v in meta.items()}, f)
    return path + ".msgpack"


def restore_state(path: str, state_template):
    if not path.endswith(".msgpack"):
        path = path + ".msgpack"
    with open(path, "rb") as f:
        return serialization.from_bytes(state_template, f.read())


def load_student_variables(path: str, variables_template: dict) -> dict:
    """Load student {params, batch_stats} from either a raw-variables msgpack
    or a full KDTrainState msgpack (trainer snapshots)."""
    if not path.endswith(".msgpack"):
        path = path + ".msgpack"
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if "student_params" in raw:
        tree = {"params": raw["student_params"],
                "batch_stats": raw.get("student_stats", {})}
    else:
        tree = raw
    return serialization.from_state_dict(variables_template, tree)


def load_meta(path: str) -> dict:
    if path.endswith(".msgpack"):
        path = path[: -len(".msgpack")]
    with open(path + ".json") as f:
        return json.load(f)


# ------------------------------------------------------------------ torch i/o
def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth into numpy (torch CPU is available in this image)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def load_torch_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], dict]:
    """Load a .pth[.tar] and return (state_dict-as-numpy, meta).

    meta carries the reference's rich-checkpoint fields when present —
    step / epoch / best_mean_IU / IU_array (reference utils/utils.py:108-127
    reads these from model_best.pth.tar to offset the resumed loop).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    meta: dict = {}
    if isinstance(obj, dict) and "state_dict" in obj:
        meta = {k: v for k, v in obj.items() if k != "state_dict"}
        obj = obj["state_dict"]
    sd = {k: v.detach().cpu().numpy() for k, v in obj.items()
          if hasattr(v, "detach")}
    return sd, meta


def _released_teacher_remap(key: str) -> str:
    """reference utils/utils.py:78-87: head.0.* -> pspmodule.*, head.1.* -> head.*"""
    if key.startswith("head.0."):
        return "pspmodule." + key[len("head.0."):]
    if key.startswith("head.1."):
        return "head." + key[len("head.1."):]
    return key


_BN_PARAM = {"weight": ("params", "weight"), "bias": ("params", "bias")}
_BN_STAT = {"running_mean": ("batch_stats", "mean"), "running_var": ("batch_stats", "var")}


def map_torch_key(key: str) -> Optional[Tuple[str, Tuple[str, ...], bool]]:
    """torch state_dict key -> (collection, flax path, transpose_conv).

    Returns None for keys with no counterpart (fc, num_batches_tracked, ...).
    """
    if key.startswith("module."):
        key = key[len("module."):]
    key = _released_teacher_remap(key)
    parts = key.split(".")
    if parts[0] == "fc" or parts[-1] == "num_batches_tracked":
        return None

    def bn(prefix: Tuple[str, ...], leaf: str):
        if leaf in _BN_PARAM:
            coll, name = _BN_PARAM[leaf]
            return (coll, prefix + (name,), False)
        if leaf in _BN_STAT:
            coll, name = _BN_STAT[leaf]
            return (coll, prefix + (name,), False)
        return None

    # stem convs / bns
    if parts[0] in ("conv1", "conv2", "conv3") and len(parts) == 2:
        return ("params", (parts[0], "kernel"), True)
    if parts[0] in ("bn1", "bn2", "bn3") and len(parts) == 2:
        return bn((parts[0],), parts[1])

    # residual layers: layerL.i.<rest>
    if parts[0].startswith("layer") and len(parts) >= 3:
        block = f"{parts[0]}_{parts[1]}"
        rest = parts[2:]
        if rest[0].startswith("conv") and rest[1] == "weight":
            return ("params", (block, rest[0], "kernel"), True)
        if rest[0].startswith("bn"):
            return bn((block, rest[0]), rest[1])
        if rest[0] == "downsample":
            if rest[1] == "0" and rest[2] == "weight":
                return ("params", (block, "downsample_conv", "kernel"), True)
            if rest[1] == "1":
                return bn((block, "downsample_bn"), rest[2])
        return None

    # PSP module
    if parts[0] == "pspmodule":
        if parts[1] == "stages":
            i = parts[2]
            if parts[3] == "1" and parts[4] == "weight":
                return ("params", ("pspmodule", f"stage{i}_conv", "kernel"), True)
            if parts[3] == "2":
                return bn(("pspmodule", f"stage{i}_bn"), parts[4])
        if parts[1] == "bottleneck":
            if parts[2] == "0" and parts[3] == "weight":
                return ("params", ("pspmodule", "bottleneck_conv", "kernel"), True)
            if parts[2] == "1":
                return bn(("pspmodule", "bottleneck_bn"), parts[3])
        return None

    # classification head (1x1 conv with bias)
    if parts[0] == "head" and len(parts) == 2:
        if parts[1] == "weight":
            return ("params", ("head", "kernel"), True)
        if parts[1] == "bias":
            return ("params", ("head", "bias"), False)

    # DSN aux head: dsn.0 conv(+bias), dsn.1 ABN, dsn.3 conv(+bias)
    if parts[0] == "dsn":
        if parts[1] == "0":
            return ("params", ("dsn_conv1", "kernel" if parts[2] == "weight" else "bias"),
                    parts[2] == "weight")
        if parts[1] == "1":
            return bn(("dsn_bn",), parts[2])
        if parts[1] == "3":
            return ("params", ("dsn_conv2", "kernel" if parts[2] == "weight" else "bias"),
                    parts[2] == "weight")
    return None


def _merge_torch(state_dict: Dict[str, np.ndarray], variables: dict,
                 mapper, collections: Tuple[str, ...]) -> dict:
    """Merge torch keys into flax variable collections via `mapper`
    (intersection semantics with shape check, reference utils/utils.py:101)."""
    flat = {
        coll: traverse_util.flatten_dict(variables.get(coll, {}))
        for coll in collections
    }
    loaded, skipped = 0, []
    for key, value in state_dict.items():
        mapped = mapper(key)
        if mapped is None:
            skipped.append(key)
            continue
        coll, path, transpose = mapped
        if coll not in flat or path not in flat[coll]:
            skipped.append(key)
            continue
        v = np.asarray(value)
        if transpose and v.ndim == 4:
            v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
        target = flat[coll][path]
        if tuple(v.shape) != tuple(target.shape):
            skipped.append(f"{key} (shape {v.shape} vs {tuple(target.shape)})")
            continue
        flat[coll][path] = v.astype(np.asarray(target).dtype)
        loaded += 1
    if skipped:
        log.info("torch import: %d loaded, %d skipped (%s%s)", loaded, len(skipped),
                 ", ".join(skipped[:5]), "…" if len(skipped) > 5 else "")
    out = dict(variables)
    for coll in collections:
        if variables.get(coll):
            out[coll] = traverse_util.unflatten_dict(flat[coll])
    return out


def import_torch_respspnet(state_dict: Dict[str, np.ndarray], variables: dict) -> dict:
    """Merge a torch ResPSPNet state_dict into flax variables (params +
    batch_stats). Unknown keys are skipped with a log line."""
    return _merge_torch(state_dict, variables, map_torch_key,
                        ("params", "batch_stats"))


def map_torch_discriminator_key(key: str) -> Optional[Tuple[str, Tuple[str, ...], bool]]:
    """torch SAGAN-Discriminator key -> (collection, flax path, transpose_conv).

    The reference wraps each stride-2 conv in `SpectralNorm` (reference
    networks/spectral.py:44-63), which deletes the conv's `weight` and
    registers `weight_u` / `weight_v` / `weight_bar` on the wrapped module —
    so checkpoint keys look like `l1.0.module.weight_bar`, `l1.0.module.bias`.
    `weight_bar` is the UN-normalized weight (sigma is recomputed per
    forward), matching our SNConv's stored `weight`; u/v land in the
    `spectral` collection. `load_D_model` semantics: reference
    utils/utils.py:130-151 (incl. the `module.` DataParallel prefix strip).
    """
    if key.startswith("module."):
        key = key[len("module."):]
    parts = key.split(".")
    if parts[-1] == "num_batches_tracked":
        return None
    if parts[0] == "preprocess_additional" and len(parts) == 2:
        leaf = parts[1]
        if leaf in _BN_PARAM:
            return ("params", ("preprocess_bn", _BN_PARAM[leaf][1]), False)
        if leaf in _BN_STAT:
            return ("batch_stats", ("preprocess_bn", _BN_STAT[leaf][1]), False)
        return None
    if parts[0] in ("l1", "l2", "l3", "l4") and len(parts) == 4 \
            and parts[1] == "0" and parts[2] == "module":
        leaf = parts[3]
        if leaf == "weight_bar":
            return ("params", (parts[0], "weight"), True)
        if leaf == "weight_u":
            return ("spectral", (parts[0], "u"), False)
        if leaf == "weight_v":
            return ("spectral", (parts[0], "v"), False)
        if leaf == "bias":
            return ("params", (parts[0], "bias"), False)
        return None
    if parts[0] == "last" and len(parts) == 3 and parts[1] == "0":
        return ("params", ("last", "kernel" if parts[2] == "weight" else "bias"),
                parts[2] == "weight")
    if parts[0] in ("attn1", "attn2"):
        if len(parts) == 2 and parts[1] == "gamma":
            return ("params", (parts[0], "gamma"), False)
        if len(parts) == 3 and parts[1] in ("query_conv", "key_conv", "value_conv"):
            return ("params",
                    (parts[0], parts[1], "kernel" if parts[2] == "weight" else "bias"),
                    parts[2] == "weight")
    return None


def import_torch_discriminator(state_dict: Dict[str, np.ndarray],
                               variables: dict) -> dict:
    """Merge a torch Discriminator state_dict into flax variables
    (params + batch_stats + spectral power-iteration state)."""
    return _merge_torch(state_dict, variables, map_torch_discriminator_key,
                        ("params", "batch_stats", "spectral"))


def export_torch_discriminator(variables: dict) -> Dict[str, np.ndarray]:
    """Inverse of `import_torch_discriminator` (interop + roundtrip tests)."""
    out: Dict[str, np.ndarray] = {}
    bn_leaf = {"weight": "weight", "bias": "bias",
               "mean": "running_mean", "var": "running_var"}
    for coll in ("params", "batch_stats", "spectral"):
        for path, v in traverse_util.flatten_dict(variables.get(coll, {})).items():
            v = np.asarray(v)
            mod, leaf = path[:-1], path[-1]
            if mod == ("preprocess_bn",):
                out[f"preprocess_additional.{bn_leaf[leaf]}"] = v
            elif mod and mod[0] in ("l1", "l2", "l3", "l4"):
                if coll == "spectral":
                    out[f"{mod[0]}.0.module.weight_{leaf}"] = v
                elif leaf == "weight":
                    out[f"{mod[0]}.0.module.weight_bar"] = np.transpose(v, (3, 2, 0, 1))
                else:
                    out[f"{mod[0]}.0.module.bias"] = v
            elif mod == ("last",):
                if leaf == "kernel":
                    out["last.0.weight"] = np.transpose(v, (3, 2, 0, 1))
                else:
                    out["last.0.bias"] = v
            elif mod and mod[0] in ("attn1", "attn2"):
                if leaf == "gamma":
                    out[f"{mod[0]}.gamma"] = v
                elif leaf == "kernel":
                    out[f"{mod[0]}.{mod[1]}.weight"] = np.transpose(v, (3, 2, 0, 1))
                else:
                    out[f"{mod[0]}.{mod[1]}.bias"] = v
    return out


def export_torch_respspnet(variables: dict) -> Dict[str, np.ndarray]:
    """Inverse of `import_torch_respspnet` (for interop + roundtrip tests)."""
    out: Dict[str, np.ndarray] = {}

    def put(torch_key: str):
        mapped = map_torch_key(torch_key)
        assert mapped is not None
        coll, path, transpose = mapped
        tree = traverse_util.flatten_dict(variables.get(coll, {}))
        if path not in tree:
            return
        v = np.asarray(tree[path])
        if transpose and v.ndim == 4:
            v = np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
        out[torch_key] = v

    params_flat = traverse_util.flatten_dict(variables["params"])
    stats_flat = traverse_util.flatten_dict(variables.get("batch_stats", {}))

    # Build torch keys by inverting our known name schema.
    for path in list(params_flat) + list(stats_flat):
        mod = path[:-1]
        leaf = path[-1]
        torch_mod = None
        if len(mod) == 1 and (mod[0].startswith("conv") or mod[0].startswith("bn")) \
                and "_" not in mod[0]:
            torch_mod = mod[0]
        elif len(mod) == 1 and mod[0] == "head":
            torch_mod = "head"
        elif mod and mod[0].startswith("layer") and "_" in mod[0]:
            layer, idx = mod[0].split("_")
            sub = mod[1]
            if sub == "downsample_conv":
                torch_mod = f"{layer}.{idx}.downsample.0"
            elif sub == "downsample_bn":
                torch_mod = f"{layer}.{idx}.downsample.1"
            else:
                torch_mod = f"{layer}.{idx}.{sub}"
        elif mod and mod[0] == "pspmodule":
            sub = mod[1]
            if sub.startswith("stage"):
                i = sub[len("stage"):sub.index("_")]
                torch_mod = f"pspmodule.stages.{i}." + ("1" if sub.endswith("conv") else "2")
            elif sub == "bottleneck_conv":
                torch_mod = "pspmodule.bottleneck.0"
            elif sub == "bottleneck_bn":
                torch_mod = "pspmodule.bottleneck.1"
        elif mod and mod[0] == "dsn_conv1":
            torch_mod = "dsn.0"
        elif mod and mod[0] == "dsn_bn":
            torch_mod = "dsn.1"
        elif mod and mod[0] == "dsn_conv2":
            torch_mod = "dsn.3"
        if torch_mod is None:
            continue
        leaf_map = {"kernel": "weight", "weight": "weight", "bias": "bias",
                    "mean": "running_mean", "var": "running_var"}
        put(f"{torch_mod}.{leaf_map[leaf]}")
    return out
