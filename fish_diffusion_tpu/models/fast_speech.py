"""FastSpeech2 FFT-block encoder, TPU-native flax.

Capability parity with the reference
``fish_diffusion/modules/encoders/fast_speech.py``:
- interleaved sin/cos positional table (PositionalEncoding :10-62), with the
  reversed-position variant used by ``RelPositionalEncoding`` (:96-119)
- ``TransformerFFNLayer`` conv-FFN: conv1d(k=9, SAME) scaled by k^-0.5 ->
  gelu -> linear (:230-278)
- ``EncSALayer`` pre-LN self-attention (+bias-free projections) + conv-FFN
  with padding-mask re-zeroing after every residual (:698-766)
- ``FFTBlocks`` / ``FastSpeech2Encoder`` (:798-947): embed_scale * proj,
  rel-pos encoding, N layers, final LN

Kept faithful quirks: the input is scaled by sqrt(hidden) twice (once by
``embed_scale``, once inside the positional encoding) exactly as the
reference composes them (fast_speech.py:938-944 + :117).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import ENCODERS

Dtype = Any


def interleaved_positions(
    length: int, d_model: int, reverse: bool = False
) -> np.ndarray:
    """pe[:, 0::2]=sin, pe[:, 1::2]=cos (reference fast_speech.py:29-50)."""
    if reverse:
        position = np.arange(length - 1, -1, -1.0, dtype=np.float64)[:, None]
    else:
        position = np.arange(0, length, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((length, d_model), np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


def fairseq_positions(length: int, d_model: int, padding_idx: int = 0) -> np.ndarray:
    """fairseq SinusoidalPositionalEmbedding table rows for positions
    ``padding_idx+1 .. padding_idx+length`` (reference fast_speech.py:139-160:
    [sin | cos] concatenated halves, tensor2tensor convention)."""
    half = d_model // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000.0) / (half - 1)))
    pos = np.arange(padding_idx + 1, padding_idx + 1 + length, dtype=np.float64)[:, None]
    emb = np.concatenate([np.sin(pos * freq), np.cos(pos * freq)], axis=1)
    if d_model % 2 == 1:
        emb = np.concatenate([emb, np.zeros((length, 1))], axis=1)
    return emb.astype(np.float32)


class ConvFFN(nn.Module):
    """TransformerFFNLayer (reference fast_speech.py:230-278), SAME padding."""

    hidden_size: int
    filter_size: int
    kernel_size: int = 9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.filter_size,
            kernel_size=(self.kernel_size,),
            padding=[(pad, pad)],
            dtype=self.dtype,
            name="ffn_1",
        )(x)
        x = x * self.kernel_size**-0.5
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="ffn_2")(x)
        return x


class EncSALayer(nn.Module):
    """Pre-LN self-attention + conv-FFN block (reference :698-766)."""

    hidden_size: int
    num_heads: int = 2
    kernel_size: int = 9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask: Optional[jax.Array] = None):
        keep = None
        if padding_mask is not None:
            keep = (~padding_mask)[:, :, None].astype(x.dtype)

        if self.num_heads > 0:
            residual = x
            y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layer_norm1")(x)
            attn_mask = None
            if padding_mask is not None:
                attn_mask = (~padding_mask)[:, None, None, :]
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                use_bias=False,
                dtype=self.dtype,
                name="self_attn",
            )(y, y, y, mask=attn_mask)
            x = residual + y
            if keep is not None:
                x = x * keep

        residual = x
        y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layer_norm2")(x)
        y = ConvFFN(
            self.hidden_size,
            4 * self.hidden_size,
            self.kernel_size,
            dtype=self.dtype,
            name="ffn",
        )(y)
        x = residual + y
        if keep is not None:
            x = x * keep
        return x


class FFTBlocks(nn.Module):
    """reference fast_speech.py:798-892. IO [B, T, C]; mask True=pad."""

    hidden_size: int
    num_layers: int
    max_seq_len: int = 4096
    ffn_kernel_size: int = 9
    num_heads: int = 2
    use_pos_embed: bool = True
    use_last_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask: Optional[jax.Array] = None):
        if padding_mask is None:
            padding_mask = jnp.zeros(x.shape[:2], bool)
        keep = (~padding_mask)[:, :, None].astype(x.dtype)

        if self.use_pos_embed:
            alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,))
            # fairseq table (positions begin at padding_idx+1; the reference
            # derives them from x[..., 0] != 0, which for real-valued
            # features is all-true -> positions 1..T)
            table = jnp.asarray(fairseq_positions(x.shape[1], self.hidden_size))
            x = x + alpha * table[None]

        x = x * keep
        for i in range(self.num_layers):
            x = EncSALayer(
                self.hidden_size,
                self.num_heads,
                self.ffn_kernel_size,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, padding_mask)
            x = x * keep

        if self.use_last_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x) * keep
        return x


@ENCODERS.register_module()
class FastSpeech2Encoder(nn.Module):
    """reference fast_speech.py:892-947."""

    input_size: int = 1024
    max_seq_len: int = 4096
    num_layers: int = 4
    hidden_size: int = 256
    ffn_kernel_size: int = 9
    num_heads: int = 2
    use_embedding_to_input: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, contents, encoder_padding_mask=None):
        embed_scale = math.sqrt(self.hidden_size)

        if self.use_embedding_to_input:
            x = nn.Embed(
                self.input_size, self.hidden_size, dtype=self.dtype, name="proj"
            )(contents.astype(jnp.int32))
        else:
            x = nn.Dense(self.hidden_size, dtype=self.dtype, name="proj")(
                contents.astype(self.dtype)
            )
        x = embed_scale * x

        # RelPositionalEncoding: x * sqrt(h) + reversed-position table. The
        # reference builds the reversed table over max_len=5000 at init and
        # only SLICES the first T rows (fast_speech.py:27-31), so positions
        # run 4999..5000-T — not T-1..0 — unless T exceeds 5000.
        T = x.shape[1]
        full = max(5000, T)
        pos = interleaved_positions(full, self.hidden_size, reverse=True)[:T]
        x = x * embed_scale + jnp.asarray(pos)[None]

        return FFTBlocks(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            max_seq_len=self.max_seq_len,
            ffn_kernel_size=self.ffn_kernel_size,
            num_heads=self.num_heads,
            use_pos_embed=False,
            dtype=self.dtype,
            name="fft_blocks",
        )(x, encoder_padding_mask)
