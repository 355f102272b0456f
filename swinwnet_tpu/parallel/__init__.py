from .sharding import (
    make_mesh,
    replicate,
    shard_batch,
    data_sharding,
    pad_to_multiple,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "data_sharding", "pad_to_multiple"]
