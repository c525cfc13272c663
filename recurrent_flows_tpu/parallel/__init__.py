from .mesh import make_mesh, replicate, shard_batch, data_sharding

__all__ = ["make_mesh", "replicate", "shard_batch", "data_sharding"]
