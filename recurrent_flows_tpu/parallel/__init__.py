from .mesh import (
    data_sharding,
    make_mesh,
    replicate,
    shard_batch,
    spatial_constraint,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "data_sharding",
    "spatial_constraint",
]
