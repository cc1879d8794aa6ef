from .mesh import make_mesh, batch_sharded, shard_batch

__all__ = ["make_mesh", "batch_sharded", "shard_batch"]
