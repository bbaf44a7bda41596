"""Shared building blocks for flax models.

Conventions (TPU-first, differ from the torch reference):
- all sequence tensors are channels-last ``[B, T, C]`` so the channel dim maps
  onto TPU lanes and 1x1 convs become plain Dense matmuls on the MXU
- computation dtype is configurable (``dtype``), parameters stay float32
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def mish(x: jax.Array) -> jax.Array:
    """Mish activation (reference modules/wavenet.py:8-10)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def diffusion_embedding(t: jax.Array, dim: int, dtype: Dtype = jnp.float32):
    """Sinusoidal diffusion-step embedding (reference wavenet.py:13-27).

    t: [B] (float or int timesteps) -> [B, dim]
    """
    half_dim = dim // 2
    emb_scale = math.log(10000) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb_scale)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    return emb.astype(dtype)


class LinearNorm(nn.Module):
    """Xavier-init linear (reference wavenet.py:30-43)."""

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)


class Conv1x1(nn.Module):
    """Pointwise conv == Dense over channels. Kaiming-normal init to match the
    reference's ConvNorm(kernel_size=1) (wavenet.py:46-80)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.kaiming_normal()

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )(x)


def shift_seq(x: jax.Array, shift: jax.Array) -> jax.Array:
    """Zero-filled shift along the time axis (axis 1) by a *traced* amount.

    ``shift > 0`` moves content right: out[:, t] = x[:, t - shift] (0 where
    t < shift). Works under jit/scan with a dynamic shift — this is what lets
    a WaveNet dilation cycle run as a single scanned block instead of N
    separately-compiled convolutions.
    """
    T = x.shape[1]
    rolled = jnp.roll(x, shift, axis=1)
    t_idx = jnp.arange(T)[None, :, None]
    valid = (t_idx >= shift) & (t_idx < T + shift)
    return jnp.where(valid, rolled, 0)


def _static_shift(x: jax.Array, shift: int) -> jax.Array:
    """Zero-filled shift along axis 1 by a STATIC amount: a pad + slice
    XLA fuses into the consuming matmul's operand load. Same semantics as
    ``shift_seq`` for a concrete shift."""
    T = x.shape[1]
    if shift == 0:
        return x
    if shift > 0:
        return jnp.pad(x, ((0, 0), (shift, 0), (0, 0)))[:, :T]
    return jnp.pad(x, ((0, 0), (0, -shift), (0, 0)))[:, -shift:]


class DilatedConvK3(nn.Module):
    """Kernel-3 dilated 1-D conv expressed as three shifted matmuls.

    out[t] = W_l x[t-d] + W_c x[t] + W_r x[t+d]  (zero padding)

    All layers of a dilation cycle share one compiled body under
    ``lax.scan``. When the cycle's dilation VALUES are known statically
    (``dilation_values`` set; always true for the configs — dilation is
    ``2**(i % cycle)``), the per-step scan input is the cycle INDEX and the
    shifts are a ``lax.switch`` over branches with STATIC pad/slice shifts:
    measured 32.4 -> 25.7 ms per 20x512 train step on v5e vs the dynamic
    roll+mask path (docs/artifacts/train_variants_r05.json — the traced
    roll was 21% of the step). With ``dilation_values=None`` the dilation
    is treated as a traced scalar via ``shift_seq`` (legacy path). Each
    matmul hits the MXU; XLA fuses the adds. Matches torch ``Conv1d(k=3,
    padding=d, dilation=d)`` semantics (reference wavenet.py:88-95).
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    dilation_values: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x: jax.Array, dilation: jax.Array):
        """``dilation``: the dilation value (legacy) or, when
        ``dilation_values`` is set, the INDEX into it."""
        dense = lambda name: nn.Dense(
            self.features,
            use_bias=False,
            kernel_init=nn.initializers.kaiming_normal(),
            dtype=self.dtype,
            name=name,
        )
        if self.dilation_values is not None:
            vals = tuple(int(d) for d in self.dilation_values)
            if len(vals) == 1:
                left_in = _static_shift(x, vals[0])
                right_in = _static_shift(x, -vals[0])
            else:
                left_in, right_in = jax.lax.switch(
                    dilation,
                    [
                        (lambda x, d=d: (_static_shift(x, d),
                                         _static_shift(x, -d)))
                        for d in vals
                    ],
                    x,
                )
        else:
            left_in = shift_seq(x, dilation)
            right_in = shift_seq(x, -dilation)
        left = dense("w_left")(left_in)
        center = dense("w_center")(x)
        right = dense("w_right")(right_in)
        out = left + center + right
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + bias.astype(self.dtype)
        return out
