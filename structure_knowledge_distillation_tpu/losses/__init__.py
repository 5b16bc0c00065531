from structure_knowledge_distillation_tpu.losses.adversarial import (
    adv_loss_for_d,
    adv_loss_for_g,
    gradient_penalty,
)
from structure_knowledge_distillation_tpu.losses.distill import (
    pairwise_affinity_loss,
    pixel_wise_kl,
    sim_dis_compute,
    similarity_gram,
)
from structure_knowledge_distillation_tpu.losses.ohem import (
    criterion_ohem_dsn,
    ohem_cross_entropy,
)
from structure_knowledge_distillation_tpu.losses.task import criterion_dsn, cross_entropy_ignore

__all__ = [
    "adv_loss_for_d",
    "adv_loss_for_g",
    "gradient_penalty",
    "pairwise_affinity_loss",
    "pixel_wise_kl",
    "sim_dis_compute",
    "similarity_gram",
    "criterion_dsn",
    "cross_entropy_ignore",
    "criterion_ohem_dsn",
    "ohem_cross_entropy",
]
