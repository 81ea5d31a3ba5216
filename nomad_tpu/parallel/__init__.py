from .mesh import (
    batch_sharding,
    data_mesh,
    grid_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
    sharded_cdist,
)

__all__ = [
    "batch_sharding",
    "data_mesh",
    "grid_mesh",
    "pad_to_multiple",
    "replicated",
    "shard_batch",
    "sharded_cdist",
]
