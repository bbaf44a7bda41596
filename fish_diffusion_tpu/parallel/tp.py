"""Tensor-parallel sharding rules.

The reference has no TP (SURVEY.md §2.4 — DDP only); this module is the
TPU-native extension for the large attention denoisers (LlamaDenoiser,
TransformerDecoderDenoiser): Megatron-style column/row parallel layout over
the ``model`` mesh axis, expressed purely as parameter shardings — GSPMD
inserts the all-reduces.

Rules (per transformer block):
- q/k/v projections: column-parallel  (kernel [h, h]   -> P(None, 'model'))
- attention output:  row-parallel     (kernel [h, h]   -> P('model', None))
- MLP gate/up:       column-parallel  (kernel [h, 4h]  -> P(None, 'model'))
- MLP down:          row-parallel     (kernel [4h, h]  -> P('model', None))
- embeddings:        vocab-sharded    (table [V, h]    -> P('model', None))
Everything else (norm scales, small projections) is replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW_PARALLEL = ("o_proj", "down_proj")
_VOCAB_SHARDED = ("embed_tokens", "lm_head")


def llama_param_spec(path) -> P:
    """PartitionSpec for one parameter, by its tree path."""
    keys = [str(getattr(p, "key", p)) for p in path]

    for name in _COLUMN_PARALLEL:
        if name in keys:
            return P(None, "model")
    for name in _ROW_PARALLEL:
        if name in keys:
            return P("model", None)
    for name in _VOCAB_SHARDED:
        if name in keys:
            return P("model", None) if keys[-1] == "embedding" else P(None, "model")
    return P()


def llama_param_shardings(params: Any, mesh: Mesh):
    """NamedSharding tree for a LlamaDenoiser/causal-LM param pytree."""

    def to_sharding(path, leaf):
        spec = llama_param_spec(path)
        # drop specs that don't match the leaf's rank
        if len([a for a in spec if a is not None]) and leaf.ndim < len(spec):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params: Any, mesh: Mesh):
    """Place a param pytree onto the mesh with the llama TP layout."""
    shardings = llama_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
