from .mesh import (
    batch_sharding,
    get_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "get_mesh",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
]
