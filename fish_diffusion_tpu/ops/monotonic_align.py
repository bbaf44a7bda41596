"""Monotonic (Viterbi maximum-path) alignment, GlowTTS/VITS-style.

Capability parity with the reference
``fish_diffusion/modules/monotonic_align/`` (the repo's single compiled
component — a numba kernel, core.py:14-46): forward DP
``value[y, x] += max(value[y-1, x-1], value[y-1, x])`` over the monotonic
band, then argmax backtracking from ``(t_y-1, t_x-1)``.

Two native implementations:
- ``maximum_path`` — batched on-device JAX: the forward DP is one
  ``lax.scan`` over mel frames with VPU row updates (the per-row max+add is
  elementwise over text positions), backtracking a second scan. The whole
  alignment jits into a single XLA program; no host round-trip.
- ``maximum_path_native`` (fish_diffusion_tpu.native) — C++ host kernel for
  preprocessing-time use, same contract as the numba original.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e9


@functools.partial(jax.jit, static_argnums=())
def maximum_path(
    neg_cent: jax.Array, t_ys: jax.Array, t_xs: jax.Array
) -> jax.Array:
    """values [B, T_y, T_x] (higher = better), per-batch valid lengths
    t_ys/t_xs -> one-hot path [B, T_y, T_x] (int32).

    Matches ``maximum_path_jit`` (reference core.py:14-46) exactly on the
    valid region; entries outside (y >= t_y or x >= t_x) are 0.
    """
    B, T_y, T_x = neg_cent.shape
    x_idx = jnp.arange(T_x)

    # ---- forward DP: scan over y, carry = cumulative row v [B, T_x] ----
    # row 0 is pinned to x=0 (the first frame must be the first phone)
    row0 = neg_cent[:, 0, :] + jnp.where(x_idx == 0, 0.0, _NEG)[None, :]

    def fwd(v, value_row):
        shifted = jnp.concatenate(
            [jnp.full((B, 1), _NEG, v.dtype), v[:, :-1]], axis=1
        )
        v_new = value_row + jnp.maximum(shifted, v)
        return v_new, v_new

    _, V_rest = jax.lax.scan(fwd, row0, jnp.swapaxes(neg_cent[:, 1:], 0, 1))
    V = jnp.concatenate([row0[None], V_rest], axis=0)
    # V: [T_y, B, T_x] cumulative scores

    # ---- backtrack: reverse scan over y ----
    index_init = (t_xs - 1).astype(jnp.int32)
    batch = jnp.arange(B)

    def bwd(index, inputs):
        y, V_prev_row = inputs  # V_prev_row = V[y-1] (V_init row for y=0)
        active = y < t_ys

        path_row = (
            (x_idx[None, :] == index[:, None]) & active[:, None]
        ).astype(jnp.int32)

        left = V_prev_row[batch, jnp.maximum(index - 1, 0)]
        same = V_prev_row[batch, index]
        move = (index != 0) & ((index == y) | (same < left))
        new_index = jnp.where(active & (y > 0), index - move.astype(jnp.int32), index)
        return new_index, path_row

    ys = jnp.arange(T_y - 1, -1, -1)
    # V[y-1] rows; the y=0 entry is a dummy (never read: index==0 there)
    V_prev = jnp.concatenate([V[:1], V[:-1]], axis=0)
    _, path_rows = jax.lax.scan(bwd, index_init, (ys, V_prev[ys]))

    path = jnp.flip(path_rows, axis=0)  # [T_y, B, T_x] back in y order
    path = jnp.swapaxes(path, 0, 1)

    # zero out x >= t_x
    path = path * (x_idx[None, None, :] < t_xs[:, None, None])
    return path


def maximum_path_from_mask(neg_cent: jax.Array, mask: jax.Array) -> jax.Array:
    """Reference __init__.py:7-17 contract: mask [B, T_y, T_x]."""
    t_ys = mask[:, :, 0].sum(axis=1).astype(jnp.int32)
    t_xs = mask[:, 0, :].sum(axis=1).astype(jnp.int32)
    return maximum_path(neg_cent, t_ys, t_xs).astype(neg_cent.dtype)


def maximum_path_numpy(
    values: np.ndarray, t_ys: np.ndarray, t_xs: np.ndarray
) -> np.ndarray:
    """Plain-numpy golden reference for tests (same DP, host-side)."""
    values = values.copy().astype(np.float32)
    B, T_y, T_x = values.shape
    paths = np.zeros_like(values, dtype=np.int32)

    for b in range(B):
        value = values[b]
        t_y, t_x = int(t_ys[b]), int(t_xs[b])

        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = _NEG if x == y else value[y - 1, x]
                if x == 0:
                    v_prev = 0.0 if y == 0 else _NEG
                else:
                    v_prev = value[y - 1, x - 1]
                value[y, x] += max(v_prev, v_cur)

        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[b, y, index] = 1
            if index != 0 and (
                index == y or value[y - 1, index] < value[y - 1, index - 1]
            ):
                index -= 1

    return paths
