"""Fully-sharded data parallelism (ZeRO-3 equivalent) as sharding rules.

The reference's only sharded-state training is DeepSpeed ZeRO stage-3 for the
LLM-TTS fine-tune (``tools/tts/ds_config.json:10-13``). On TPU the same
memory win needs no runtime library: shard every large parameter (and, by
inheritance, its Adam moments) across the ``data`` axis, and XLA:GSPMD
all-gathers a layer's weights right before use and reduce-scatters its
gradients — DeepSpeed's gather/partition schedule, emitted by the compiler.

Rules:
- parameters with fewer elements than ``min_size`` stay replicated (gathering
  a 256-element bias costs more than storing it everywhere)
- otherwise shard the LARGEST axis divisible by the mesh axis size (best
  balance, least padding); ties resolve to the later axis (usually the
  output/features axis, which keeps row-major collectives contiguous)
- composes with tensor parallelism: pass ``base_spec`` (e.g. the Megatron
  spec from ``tp.llama_param_spec``) and the fsdp axis is assigned to the
  largest still-unsharded dimension
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DEFAULT_MIN_SIZE = 2**16


def fsdp_param_spec(
    leaf,
    axis_size: int,
    axis_name: str = "data",
    min_size: int = DEFAULT_MIN_SIZE,
    base_spec: Optional[P] = None,
) -> P:
    """PartitionSpec sharding the largest free axis of ``leaf`` over
    ``axis_name``, or the (possibly partial) base spec if nothing fits."""
    spec = list(base_spec) if base_spec is not None else []
    spec += [None] * (leaf.ndim - len(spec))

    if leaf.size < min_size or axis_size <= 1:
        return P(*spec)

    best = -1
    for d in range(leaf.ndim):
        if spec[d] is not None:
            continue  # already sharded (e.g. by TP)
        if leaf.shape[d] % axis_size != 0:
            continue
        if best < 0 or leaf.shape[d] >= leaf.shape[best]:
            best = d
    if best < 0:
        return P(*spec)

    spec[best] = axis_name
    return P(*spec)


def fsdp_param_shardings(
    params: Any,
    mesh: Mesh,
    axis_name: str = "data",
    min_size: int = DEFAULT_MIN_SIZE,
    base_spec_fn=None,
):
    """NamedSharding pytree for fully-sharded params.

    ``base_spec_fn(path) -> PartitionSpec`` optionally supplies a TP layout
    to compose with (fsdp takes the largest remaining axis).
    """
    axis_size = mesh.shape[axis_name]

    def to_sharding(path, leaf):
        base = base_spec_fn(path) if base_spec_fn is not None else None
        if base is not None and len(base) > leaf.ndim:
            base = P()
        return NamedSharding(
            mesh,
            fsdp_param_spec(
                leaf, axis_size, axis_name, min_size, base_spec=base
            ),
        )

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params_fsdp(params: Any, mesh: Mesh, **kwargs):
    """Place a param pytree onto the mesh fully sharded."""
    shardings = fsdp_param_shardings(params, mesh, **kwargs)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def fsdp_state_shardings(
    state: Any,
    mesh: Mesh,
    axis_name: str = "data",
    min_size: int = DEFAULT_MIN_SIZE,
):
    """Sharding pytree for a whole TrainState (params, EMA, optimizer
    moments, counters) under the shape-based FSDP rule.

    Because the rule depends only on a leaf's shape, Adam's ``mu``/``nu``
    (which mirror the param tree) land on exactly the params' layout — the
    ZeRO property that optimizer state never materializes unsharded.
    Scalars/counters fall below ``min_size`` and stay replicated.
    """
    axis_size = mesh.shape[axis_name]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, fsdp_param_spec(leaf, axis_size, axis_name, min_size)
        ),
        state,
    )
