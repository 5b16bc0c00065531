from structure_knowledge_distillation_tpu.ops.batch_norm import ABN, BatchNorm2d, abn_normalize
from structure_knowledge_distillation_tpu.ops.pooling import (
    adaptive_avg_pool_2d,
    avg_pool_matrix,
    max_pool_2d,
)
from structure_knowledge_distillation_tpu.ops.pallas_bn import (
    abn_fused_eval,
    abn_fused_train,
)
from structure_knowledge_distillation_tpu.ops.pallas_ce import upsampled_ce_loss
from structure_knowledge_distillation_tpu.ops.resize import (
    interp_matrix_align_corners,
    resize_bilinear_align_corners,
)
from structure_knowledge_distillation_tpu.ops.spectral import SNConv

__all__ = [
    "ABN",
    "BatchNorm2d",
    "abn_normalize",
    "adaptive_avg_pool_2d",
    "avg_pool_matrix",
    "max_pool_2d",
    "interp_matrix_align_corners",
    "resize_bilinear_align_corners",
    "abn_fused_eval",
    "abn_fused_train",
    "upsampled_ce_loss",
    "SNConv",
]
