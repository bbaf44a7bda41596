"""Length-adaption tensor ops (parity with reference ``utils/tensor.py``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def repeat_expand(content: jax.Array, target_len: int, mode: str = "nearest"):
    """Resample last axis to ``target_len`` (reference utils/tensor.py:7-43).

    Matches ``torch.nn.functional.interpolate`` semantics:
    - ``nearest``: floor(i * scale) source indexing
    - ``linear``: align_corners=False half-pixel sampling

    Accepts 1-D [T], 2-D [C, T], or 3-D [B, C, T]; static target_len.
    """
    ndim = content.ndim
    if ndim == 1:
        content = content[None, None]
    elif ndim == 2:
        content = content[None]
    assert content.ndim == 3

    src_len = content.shape[-1]

    if mode == "nearest":
        idx = (jnp.arange(target_len) * (src_len / target_len)).astype(jnp.int32)
        idx = jnp.clip(idx, 0, src_len - 1)
        result = content[..., idx]
    elif mode == "linear":
        scale = src_len / target_len
        pos = (jnp.arange(target_len) + 0.5) * scale - 0.5
        pos = jnp.clip(pos, 0.0, src_len - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.clip(lo + 1, 0, src_len - 1)
        w = (pos - lo).astype(content.dtype)
        result = content[..., lo] * (1 - w) + content[..., hi] * w
    else:
        raise NotImplementedError(mode)

    if ndim == 1:
        return result[0, 0]
    if ndim == 2:
        return result[0]
    return result


def interpolate(
    x: jax.Array,
    xp: jax.Array,
    fp: jax.Array,
    left: Optional[jax.Array] = None,
    right: Optional[jax.Array] = None,
):
    """1-D linear interpolation (reference utils/tensor.py:46-84, np.interp-like)."""
    i = jnp.clip(jnp.searchsorted(xp, x, side="right"), 1, len(xp) - 1)
    interped = (fp[i - 1] * (xp[i] - x) + fp[i] * (x - xp[i - 1])) / (xp[i] - xp[i - 1])

    if left is None:
        left = fp[0]
    interped = jnp.where(x < xp[0], left, interped)

    if right is None:
        right = fp[-1]
    interped = jnp.where(x > xp[-1], right, interped)

    return interped
