from .multihost import initialize_multihost
from .sharding import (
    make_mesh,
    replicate,
    shard_batch,
    data_sharding,
    pad_to_multiple,
)

__all__ = [
    "initialize_multihost","make_mesh", "replicate", "shard_batch", "data_sharding", "pad_to_multiple"]
