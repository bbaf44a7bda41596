"""Length-adaption tensor ops (parity with reference ``utils/tensor.py``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _upsample_linear_integer(x: jax.Array, factor: int) -> jax.Array:
    """Gather-free linear upsampling by an integer factor (torch
    align_corners=False semantics). x: [..., T] -> [..., T*factor].

    For output j within a frame: pos = (j+0.5)/f - 0.5, so the left source
    is the previous frame for j < f/2 and the current frame otherwise; the
    lerp weight depends only on j — everything is repeats + elementwise.
    """
    f = factor
    j = jnp.arange(f, dtype=jnp.float32)
    pos = (j + 0.5) / f - 0.5  # relative position in [-0.5, 1.5)
    use_prev = pos < 0
    w = jnp.where(use_prev, pos + 1.0, pos)  # lerp weight toward "next"

    x_prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    x_next = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)

    xr = jnp.repeat(x, f, axis=-1)
    prev_r = jnp.repeat(x_prev, f, axis=-1)
    next_r = jnp.repeat(x_next, f, axis=-1)

    T_out = x.shape[-1] * f
    w_full = jnp.tile(w, x.shape[-1]).astype(x.dtype)
    use_prev_full = jnp.tile(use_prev, x.shape[-1])

    left = jnp.where(use_prev_full, prev_r, xr)
    right = jnp.where(use_prev_full, xr, next_r)
    out = left * (1 - w_full) + right * w_full

    # clip at the boundaries (torch clamps pos to [0, T-1]):
    # pos<0 for global i < f/2 - 0.5; pos>T-1 for i >= f*T - f/2 - 0.5
    import math

    n_lo = math.ceil(f / 2 - 0.5)
    n_hi_start = math.ceil(x.shape[-1] * f - f / 2 - 0.5)
    idx_full = jnp.arange(T_out)
    out = jnp.where(idx_full < n_lo, xr, out)
    out = jnp.where(idx_full >= n_hi_start, xr, out)
    return out


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

    # TPU fast paths: integer up/down factors avoid gathers entirely
    # (gathers serialize on TPU; repeat/reshape lower to broadcasts).
    if target_len % src_len == 0 and target_len != src_len:
        factor = target_len // src_len
        if mode == "nearest":
            result = jnp.repeat(content, factor, axis=-1)
        else:
            result = _upsample_linear_integer(content, factor)
    elif mode == "nearest":
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


def repeat_expand_np(content, target_len: int, mode: str = "nearest"):
    """Pure-numpy ``repeat_expand`` for HOST-SIDE glue (preprocessing CLI,
    per-segment inference prep). Identical math to the jnp version above —
    but these call sites see a UNIQUE shape per file, so the jnp path
    would compile (or eagerly dispatch over a remote-device tunnel) once
    per file; numpy on frame-rate arrays is instant. Keep the jnp version
    for code under jit."""
    content = np.asarray(content)
    ndim = content.ndim
    if ndim == 1:
        content = content[None, None]
    elif ndim == 2:
        content = content[None]
    assert content.ndim == 3

    src_len = content.shape[-1]
    if mode == "nearest":
        idx = np.clip(
            (np.arange(target_len) * (src_len / target_len)).astype(np.int64),
            0,
            src_len - 1,
        )
        result = content[..., idx]
    elif mode == "linear":
        # f32 intermediates to match the jnp path's rounding exactly
        scale = np.float32(src_len / target_len)
        pos = np.clip(
            (np.arange(target_len, dtype=np.float32) + np.float32(0.5)) * scale
            - np.float32(0.5),
            np.float32(0.0),
            np.float32(src_len - 1),
        )
        lo = np.floor(pos).astype(np.int64)
        hi = np.clip(lo + 1, 0, src_len - 1)
        w = (pos - lo).astype(content.dtype)
        result = content[..., lo] * (1 - w) + content[..., hi] * w
    else:
        raise NotImplementedError(mode)

    if ndim == 1:
        return result[0, 0]
    if ndim == 2:
        return result[0]
    return result
