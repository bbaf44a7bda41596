from .fsdp import (
    fsdp_param_shardings,
    fsdp_param_spec,
    fsdp_state_shardings,
    shard_params_fsdp,
)
from .mesh import (
    batch_sharding,
    get_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from .sp import shard_batch_sp
from .tp import llama_param_shardings, shard_params

__all__ = [
    "batch_sharding",
    "fsdp_param_shardings",
    "fsdp_param_spec",
    "fsdp_state_shardings",
    "get_mesh",
    "llama_param_shardings",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_sp",
    "shard_params",
    "shard_params_fsdp",
]
