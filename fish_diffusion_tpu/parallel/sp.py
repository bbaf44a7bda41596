"""Sequence parallelism: shard activations along time over a ``seq`` axis.

The reference has no SP of any kind (SURVEY.md §5 — lengths stay short by
construction); this is the framework's long-context extension for the
attention denoisers (LlamaDenoiser, TransformerDecoderDenoiser). It is pure
sharding, no model changes:

- batch leaves with a time axis get ``P('data', 'seq')``; the GSPMD
  partitioner then keeps every elementwise/MLP op local to its sequence
  shard and inserts the attention collectives (an all-gather of K/V per
  head block — the Ulysses pattern) only where scores need the full key
  axis.
- losses reduce over the full sequence, so gradients and the optimizer
  update need no extra handling.

Use when one chip cannot hold a sequence's activations (TTS with very long
prompts); for the convolutional denoisers prefer plain data parallelism —
their receptive fields would force halo exchanges per layer.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sp_batch_sharding(mesh: Mesh, leaf) -> NamedSharding:
    """P('data', 'seq', ...) for time-major leaves, P('data') otherwise."""
    if leaf.ndim >= 2 and leaf.shape[1] % mesh.shape["seq"] == 0:
        return NamedSharding(mesh, P("data", "seq"))
    return NamedSharding(mesh, P("data"))


def shard_batch_sp(batch: Dict, mesh: Mesh) -> Dict:
    """Place a batch on a ('data', 'seq', ...) mesh, time axis sharded.

    Leaves whose second axis does not divide the ``seq`` axis (token ids of
    odd length, per-sample scalars) stay sharded on batch only.
    """
    return {
        k: (
            jax.device_put(v, sp_batch_sharding(mesh, v))
            if v is not None
            else None
        )
        for k, v in batch.items()
    }
