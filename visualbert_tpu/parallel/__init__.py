from visualbert_tpu.parallel.mesh import (
    LOGICAL_AXIS_RULES,
    create_mesh,
    logical_to_mesh_spec,
    shard_params,
    batch_sharding,
)

__all__ = [
    "LOGICAL_AXIS_RULES",
    "create_mesh",
    "logical_to_mesh_spec",
    "shard_params",
    "batch_sharding",
]
