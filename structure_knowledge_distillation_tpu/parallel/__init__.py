from structure_knowledge_distillation_tpu.parallel.mesh import (
    batch_sharding,
    stacked_batch_sharding,
    spatial_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_state,
    state_shardings,
)

__all__ = [
    "batch_sharding",
    "stacked_batch_sharding",
    "spatial_sharding",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_state",
    "state_shardings",
]
