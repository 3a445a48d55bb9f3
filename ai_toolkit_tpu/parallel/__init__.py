from .mesh import make_mesh, mesh_shape_for_devices
from .sharding import (
    PartitionRule,
    apply_rules,
    fsdp_partition,
    named_sharding_tree,
    replicated,
    shard_batch_spec,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for_devices",
    "PartitionRule",
    "apply_rules",
    "fsdp_partition",
    "named_sharding_tree",
    "replicated",
    "shard_batch_spec",
]
