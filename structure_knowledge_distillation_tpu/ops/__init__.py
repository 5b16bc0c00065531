from structure_knowledge_distillation_tpu.ops.batch_norm import ABN, BatchNorm2d, abn_normalize
from structure_knowledge_distillation_tpu.ops.pooling import (
    adaptive_avg_pool_2d,
    avg_pool_matrix,
    max_pool_2d,
)
from structure_knowledge_distillation_tpu.ops.resize import (
    interp_matrix_align_corners,
    resize_bilinear_align_corners,
)

__all__ = [
    "ABN",
    "BatchNorm2d",
    "abn_normalize",
    "adaptive_avg_pool_2d",
    "avg_pool_matrix",
    "max_pool_2d",
    "interp_matrix_align_corners",
    "resize_bilinear_align_corners",
]
