from .contrastive import (
    param_partition_spec,
    shard_params,
    make_contrastive_train_step,
)

__all__ = ["param_partition_spec", "shard_params", "make_contrastive_train_step"]
