from .mesh import (
    batch_sharding,
    get_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from .tp import llama_param_shardings, shard_params

__all__ = [
    "batch_sharding",
    "get_mesh",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
]
