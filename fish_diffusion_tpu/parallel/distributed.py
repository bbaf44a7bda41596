"""Multi-host (multi-slice / multi-node) runtime support.

The reference scales across nodes with Lightning's ``num_nodes`` + torch
NCCL env plumbing (``configs/svc_content_vec_multi_node.py:81-87``). The TPU
equivalent: one process per host, ``jax.distributed.initialize()`` to join
the cluster, a mesh whose ``data`` axis spans every chip (ICI within a
slice, DCN across slices), and per-host input pipelines that each load only
their shard of the global batch.

Nothing here opens sockets itself — coordination is JAX's; this module is
the glue: env-gated initialization, local/global batch-size math, and
assembling a global sharded array from per-host shards.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Join the multi-process cluster if the environment describes one.

    Recognized (same contract as ``jax.distributed.initialize``):
    - TPU pod runtimes: auto-detected, no env needed — call with no args
    - otherwise: ``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
      ``JAX_PROCESS_ID``

    Returns True when running multi-process after the call. Safe to call
    more than once and on single-host setups (no-op).
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        _initialized = True
    elif len(hostnames.split(",")) > 1 or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        # TPU pod / multislice with >1 worker: args are auto-discovered
        try:
            jax.distributed.initialize()
            _initialized = True
        except ValueError as e:
            # incomplete pod env (e.g. a tunneled single chip) — stay local
            print(f"[distributed] auto-init skipped: {e}")

    return jax.process_count() > 1


def local_batch_size(global_batch_size: int) -> int:
    """This host's share of the global batch (must divide evenly)."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by {n} processes"
    )
    return global_batch_size // n


def make_global_batch(
    local_batch: Dict[str, np.ndarray], mesh: Mesh
) -> Dict[str, jax.Array]:
    """Assemble a globally-sharded batch from this host's local shard.

    Single-process: equivalent to ``shard_batch``. Multi-process: each host
    contributes its rows; the result is one logical array sharded over the
    ``data`` axis with no cross-host data movement.
    """
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, local_batch)
