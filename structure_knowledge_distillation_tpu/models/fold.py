"""Eval-mode BN folding for the frozen teacher.

The teacher always runs in eval mode under stop_gradient (reference
networks/kd_model.py:121-122), so every ABN is a fixed per-channel affine:

    y = (conv(x) - mean) * g / sqrt(var + eps) + beta,   g = |weight| + eps

Folding pre-multiplies `g / sqrt(var + eps)` into the conv kernel's output
channels and turns the remainder into a conv bias, removing one elementwise
pass per conv (~100 ABNs per R101 forward). Use with
`ResPSPNet(fold_bn=True)`, whose ABNs reduce to their activation.

This is the TPU-era counterpart of what the reference's CUDA ABN kernels
(libs/src/bn.cu:140-165) spent effort fusing at run time — here the fusion
is done once, ahead of time, on the weights.
"""

from __future__ import annotations

import numpy as np
from flax import traverse_util

__all__ = ["fold_bn_variables"]


def _bn_partner(conv_name: str):
    if conv_name in ("head", "dsn_conv2"):
        return None
    if conv_name == "dsn_conv1":
        return "dsn_bn"
    if conv_name.endswith("_conv"):
        return conv_name[: -len("_conv")] + "_bn"
    if conv_name.startswith("conv"):
        return "bn" + conv_name[len("conv"):]
    return None


def fold_bn_variables(variables: dict, eps: float = 1e-5,
                      abs_gamma: bool = True) -> dict:
    """ResPSPNet {params, batch_stats} -> {params} for `fold_bn=True`.

    Folds each conv's following ABN (gamma = |w|+eps convention,
    reference libs/src/bn.cu:153) into kernel scale + bias, in f64 for
    bit-stable scales; existing conv biases (dsn_conv1) are folded through.
    """
    params = traverse_util.flatten_dict(variables["params"])
    stats = traverse_util.flatten_dict(variables.get("batch_stats", {}))

    def is_bn(name: str) -> bool:
        return name.startswith("bn") or name.endswith("_bn")

    out = {}
    for path, value in params.items():
        mod, leaf = path[:-1], path[-1]
        conv_name = mod[-1]
        if is_bn(conv_name):
            continue  # BN affine params are consumed by the folds below
        bn_name = _bn_partner(conv_name)
        if bn_name is None:
            out[path] = np.asarray(value)  # head / dsn_conv2 pass through
            continue
        if leaf == "bias":
            continue  # folded together with the kernel below
        bn_mod = mod[:-1] + (bn_name,)
        gamma = np.asarray(params[bn_mod + ("weight",)], np.float64)
        beta = np.asarray(params[bn_mod + ("bias",)], np.float64)
        mean = np.asarray(stats[bn_mod + ("mean",)], np.float64)
        var = np.asarray(stats[bn_mod + ("var",)], np.float64)
        g = np.abs(gamma) + eps if abs_gamma else gamma
        scale = g / np.sqrt(var + eps)
        kernel = np.asarray(value, np.float64) * scale  # HWIO: out channel last
        bias = beta - mean * scale
        orig_bias = params.get(mod + ("bias",))
        if orig_bias is not None:
            bias = bias + np.asarray(orig_bias, np.float64) * scale
        dtype = np.asarray(value).dtype
        out[path] = kernel.astype(dtype)
        out[mod + ("bias",)] = bias.astype(dtype)
    return {"params": traverse_util.unflatten_dict(out)}
