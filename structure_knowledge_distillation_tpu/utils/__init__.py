from structure_knowledge_distillation_tpu.utils.logging_utils import log_init

__all__ = ["log_init"]
