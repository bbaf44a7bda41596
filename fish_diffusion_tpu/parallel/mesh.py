"""Device mesh + sharding rules — the framework's entire "distributed backend".

The reference delegates distribution to Lightning's DDPStrategy over
NCCL/Gloo with fp16 gradient compression
(``configs/_base_/trainers/base.py:31-41``). On TPU none of that machinery
exists as user code: we define a mesh, annotate shardings, and XLA:GSPMD
emits the all-reduce/all-gather/reduce-scatter collectives over ICI (DCN
across slices). bf16 gradient all-reduce subsumes the fp16 compression hook.

Axes:
- ``data``  — batch data parallelism (the reference's only strategy)
- ``model`` — optional tensor parallelism for large denoisers (LlamaDenoiser)

``make_mesh`` builds a mesh from whatever devices exist: real TPU chips, or
virtual CPU devices under ``--xla_force_host_platform_device_count`` (how the
test suite simulates multi-chip, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shapes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a mesh; defaults to all devices on the ``data`` axis.

    ``axis_shapes`` may contain one ``-1`` that absorbs remaining devices.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)

    if axis_shapes is None:
        axis_shapes = (n, 1)

    shapes = list(axis_shapes)
    if -1 in shapes:
        known = int(np.prod([s for s in shapes if s != -1]))
        shapes[shapes.index(-1)] = n // known

    assert int(np.prod(shapes)) == n, (
        f"mesh {shapes} does not cover {n} devices"
    )

    device_array = np.asarray(devices).reshape(shapes)
    return Mesh(device_array, axis_names[: len(shapes)])


_default_mesh: Optional[Mesh] = None


def get_mesh() -> Mesh:
    """Process-wide default mesh (all devices on ``data``)."""
    global _default_mesh
    if _default_mesh is None:
        _default_mesh = make_mesh()
    return _default_mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh, batch-axis sharded.

    Works for dict batches of numpy/jnp arrays; the leading axis of every
    leaf must be divisible by the ``data`` axis size.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
