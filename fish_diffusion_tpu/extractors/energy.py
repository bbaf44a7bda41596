"""Energy extractors (parity with reference
``fish_diffusion/modules/energy_extractors/rms.py``): frame RMS equivalent to
``librosa.feature.rms`` (center reflect padding), in jnp, + repeat_expand."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tensor import repeat_expand_np
from ..registry import ENERGY_EXTRACTORS


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _rms(x, frame_length: int, hop_length: int, center: bool, pad_mode: str):
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, (pad, pad), mode=pad_mode)
    n_frames = 1 + (x.shape[0] - frame_length) // hop_length
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length
        + jnp.arange(frame_length)[None, :]
    )
    frames = x[idx]
    return jnp.sqrt(jnp.mean(frames * frames, axis=-1))


@ENERGY_EXTRACTORS.register_module()
class RMSEnergyExtractor:
    def __init__(
        self,
        frame_length: int = 2048,
        hop_length: int = 512,
        center: bool = True,
        pad_mode: str = "reflect",
    ):
        self.frame_length = frame_length
        self.hop_length = hop_length
        self.center = center
        self.pad_mode = pad_mode

    def __call__(self, x, sampling_rate=44100, pad_to=None):
        """x: [1, T] or [T] audio -> energy [n_frames] (or [pad_to])."""
        x = jnp.asarray(x, jnp.float32).reshape(-1)
        energy = _rms(
            x, self.frame_length, self.hop_length, self.center, self.pad_mode
        )
        if pad_to is None:
            return np.asarray(energy)
        # numpy: pad_to is unique per file — the jnp path would eagerly
        # dispatch a tiny device op per call in the preprocessing CLI
        return repeat_expand_np(np.asarray(energy), pad_to)
