from structure_knowledge_distillation_tpu.models.resnet_pspnet import (
    BASIC,
    BOTTLENECK,
    BasicBlock,
    Bottleneck,
    PSPModule,
    ResPSPNet,
    student_model,
    teacher_model,
)
from structure_knowledge_distillation_tpu.models.abn_blocks import (
    DenseModule,
    GlobalAvgPool2d,
    IdentityResidualBlock,
)
from structure_knowledge_distillation_tpu.models.espnet import ESPNetC
from structure_knowledge_distillation_tpu.models.fold import fold_bn_variables
from structure_knowledge_distillation_tpu.models.sagan import Discriminator, SelfAttention

__all__ = [
    "fold_bn_variables",
    "BASIC",
    "BOTTLENECK",
    "BasicBlock",
    "Bottleneck",
    "PSPModule",
    "ResPSPNet",
    "student_model",
    "teacher_model",
    "Discriminator",
    "SelfAttention",
    "ESPNetC",
    "DenseModule",
    "GlobalAvgPool2d",
    "IdentityResidualBlock",
]
