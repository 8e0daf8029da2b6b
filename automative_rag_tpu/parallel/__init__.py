from .mesh import make_mesh, shard_axis_size
from .sharded_search import ShardedFlatIndex, make_sharded_search
from .sharded_ivf import ShardedIVFIndex
from .sharded_rerank import ShardedTokenStore, make_sharded_maxsim
from .sharded_sparse import ShardedSparseIndex, make_sharded_sparse_topk
from .tp_llm import qwen2_partition_specs, shard_qwen2_model
from .pp_llm import make_pp_forward, stack_layer_params
from .sp_llm import make_sp_forward

__all__ = [
    "make_mesh",
    "shard_axis_size",
    "ShardedFlatIndex",
    "ShardedIVFIndex",
    "make_sharded_search",
    "ShardedTokenStore",
    "make_sharded_maxsim",
    "ShardedSparseIndex",
    "make_sharded_sparse_topk",
    "qwen2_partition_specs",
    "shard_qwen2_model",
    "make_pp_forward",
    "stack_layer_params",
    "make_sp_forward",
]
