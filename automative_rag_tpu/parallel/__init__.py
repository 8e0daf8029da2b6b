from .mesh import make_mesh, shard_axis_size
from .sharded_search import ShardedFlatIndex, make_sharded_search

__all__ = ["make_mesh", "shard_axis_size", "ShardedFlatIndex", "make_sharded_search"]
