from structure_knowledge_distillation_tpu.utils.logging_utils import log_init
from structure_knowledge_distillation_tpu.utils.metrics_writer import (
    MetricsWriter,
    save_args,
)


def count_params(params) -> int:
    """Total parameter count (reference print_model_parm_nums,
    utils/utils.py:164-168)."""
    import jax
    import numpy as np

    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def log_param_count(params, name: str) -> int:
    import logging

    n = count_params(params)
    logging.getLogger(__name__).info("%s: Number of params: %.2fM", name, n / 1e6)
    return n


__all__ = ["log_init", "MetricsWriter", "save_args", "count_params", "log_param_count"]
