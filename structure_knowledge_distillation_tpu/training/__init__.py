from structure_knowledge_distillation_tpu.training.train_state import (
    KDTrainState,
    create_train_state,
    make_sgd,
    poly_schedule,
)
from structure_knowledge_distillation_tpu.training.train_step import (
    make_train_loop,
    make_train_step,
)

__all__ = [
    "KDTrainState",
    "create_train_state",
    "make_sgd",
    "poly_schedule",
    "make_train_loop",
    "make_train_step",
]
