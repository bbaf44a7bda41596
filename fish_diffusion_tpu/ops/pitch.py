"""Pitch transforms (parity with reference ``fish_diffusion/utils/pitch.py``).

All functions are pure jnp and jit-safe (boolean masking via ``jnp.where``
instead of in-place indexed assignment).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_f0_bin = 256
_f0_max = 1100.0
_f0_min = 50.0
_f0_mel_min = 1127 * np.log(1 + _f0_min / 700)
_f0_mel_max = 1127 * np.log(1 + _f0_max / 700)


def pitch_to_scale(f0: jax.Array, f0_min: float = _f0_min, f0_max: float = _f0_max):
    """Linear [0,1] scaling with clipping (reference utils/pitch.py:12-22)."""
    f0_scale = (f0 - f0_min) / (f0_max - f0_min)
    f0_scale = jnp.clip(f0_scale, 0.0, 1.0)

    if f0.ndim == 2:
        f0_scale = f0_scale[..., None]

    return f0_scale


def pitch_to_mel_scale(
    f0: jax.Array,
    f0_mel_min: float = _f0_mel_min,
    f0_mel_max: float = _f0_mel_max,
    f0_bin: int = _f0_bin,
):
    """Mel-scale quantization prep (reference utils/pitch.py:25-36)."""
    f0_mel = 1127 * jnp.log(1 + f0 / 700)
    scaled = (f0_mel - f0_mel_min) * (f0_bin - 2) / (f0_mel_max - f0_mel_min) + 1
    f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = jnp.where(f0_mel <= 1, 1.0, f0_mel)
    f0_mel = jnp.where(f0_mel > f0_bin - 1, float(f0_bin - 1), f0_mel)
    return f0_mel


def pitch_to_coarse(
    f0: jax.Array,
    f0_mel_min: float = _f0_mel_min,
    f0_mel_max: float = _f0_mel_max,
    f0_bin: int = _f0_bin,
):
    """Coarse integer pitch bins in [1, 255] (reference utils/pitch.py:39-48)."""
    f0_mel = pitch_to_mel_scale(f0, f0_mel_min, f0_mel_max, f0_bin)
    return (f0_mel + 0.5).astype(jnp.int32)


def pitch_to_log(f0: jax.Array):
    """log2 of voiced f0, 0 elsewhere (reference utils/pitch.py:51-62)."""
    x = jnp.where(f0 > 0, jnp.log2(jnp.maximum(f0, 1e-20)), jnp.zeros_like(f0))

    if x.ndim == 2:
        x = x[..., None]

    return x


def pitch_quant(signals: jax.Array, win_length: int = 16):
    """Masked window-average pooling of f0 (reference utils/pitch.py:65-110).

    NaNs are ignored in the window average; zero entries keep their zero.
    Input [B, T]; output [B, T].
    """
    assert signals.ndim == 2, "Input tensor must be [batch, width]"
    original_len = signals.shape[-1]

    pad_length = (-original_len) % win_length
    if pad_length:
        signals = jnp.pad(signals, ((0, 0), (0, pad_length)))

    mask = ~jnp.isnan(signals)
    masked_x = jnp.where(mask, signals, 0.0)

    b = signals.shape[0]
    n_win = signals.shape[-1] // win_length
    sum_pooled = masked_x.reshape(b, n_win, win_length).sum(-1)
    valid_count = jnp.clip(
        mask.astype(signals.dtype).reshape(b, n_win, win_length).sum(-1), 1, None
    )
    avg_pooled = sum_pooled / valid_count

    expanded = jnp.repeat(avg_pooled, win_length, axis=-1)
    out = jnp.where(masked_x != 0, expanded, masked_x)
    return out[:, :original_len]


def pitch_to_log_quant(x: jax.Array):
    """Window-averaged log2 pitch (reference utils/pitch.py:113-129)."""
    if x.ndim == 3:
        x = x.squeeze(-1)

    x = pitch_quant(x, 16)
    x = jnp.where(x > 0, jnp.log2(jnp.maximum(x, 1e-20)), jnp.zeros_like(x))

    if x.ndim == 2:
        x = x[..., None]

    return x
