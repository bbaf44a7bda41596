"""LLaMA-architecture denoiser for GradTTS-style codec TTS, TPU-native.

Capability parity with the reference ``fish_diffusion/modules/llama.py``:
``LlamaDenoiser`` (:23-105) — HF LlamaModel used as a denoiser with the
prompt layout ``[token condition prefix | merged mel stream]`` where the mel
stream merges (diffusion-step embedding, log-mel-length embedding, projected
mel frame) through ``merge_proj``; full (bidirectional) attention over the
concatenation; output projection back to mel channels.

The transformer is implemented natively in flax (RMSNorm + RoPE + SwiGLU —
the LLaMA recipe) rather than wrapping HF: under jit the whole denoiser is
one fusable XLA program, and the weight layout is ready for a ``model``-axis
tensor-parallel sharding (heads and MLP are the natural split dims).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import DENOISERS
from .common import diffusion_embedding

Dtype = Any


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        norm = x * jax.lax.rsqrt(var + self.eps)
        return (norm * scale).astype(self.dtype)


def rotary_embedding(q, k, positions, theta: float = 10000.0):
    """Apply RoPE. q/k: [B, T, H, D]; positions: [T]."""
    d = q.shape[-1]
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    cos = jnp.cos(freqs)[None, :, None, :]
    sin = jnp.sin(freqs)[None, :, None, :]

    def rot(x):
        x1, x2 = x[..., : d // 2], x[..., d // 2 :]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )

    return rot(q), rot(k)


class LlamaBlock(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    rms_norm_eps: float = 1e-5
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, positions, attn_mask=None):
        h = self.hidden_size
        nh = self.num_heads
        hd = h // nh

        y = RMSNorm(self.rms_norm_eps, self.dtype, name="input_norm")(x)
        q = nn.Dense(h, use_bias=False, dtype=self.dtype, name="q_proj")(y)
        k = nn.Dense(h, use_bias=False, dtype=self.dtype, name="k_proj")(y)
        v = nn.Dense(h, use_bias=False, dtype=self.dtype, name="v_proj")(y)

        b, t = y.shape[:2]
        q = q.reshape(b, t, nh, hd)
        k = k.reshape(b, t, nh, hd)
        v = v.reshape(b, t, nh, hd)
        q, k = rotary_embedding(q, k, positions)

        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None, None, :], scores, -1e9)
        if self.causal:
            # HF LlamaModel attention is causal (decoder LM)
            tri = jnp.tril(jnp.ones((t, t), bool))
            scores = jnp.where(tri[None, None], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, h)
        x = x + nn.Dense(h, use_bias=False, dtype=self.dtype, name="o_proj")(attn)

        y = RMSNorm(self.rms_norm_eps, self.dtype, name="post_norm")(x)
        gate = nn.Dense(
            self.intermediate_size, use_bias=False, dtype=self.dtype, name="gate_proj"
        )(y)
        up = nn.Dense(
            self.intermediate_size, use_bias=False, dtype=self.dtype, name="up_proj"
        )(y)
        down = nn.Dense(
            h, use_bias=False, dtype=self.dtype, name="down_proj"
        )(nn.silu(gate) * up)
        return x + down


@DENOISERS.register_module(name="LlamaDenoiser")
class LlamaDenoiser(nn.Module):
    """reference llama.py:23-105. IO: mel [B, T, M] (channels-last),
    conditioner [B, E] int tokens."""

    diffusion_channels: int = 128
    hidden_size: int = 768
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 3072
    vocab_size: int = 32000
    rms_norm_eps: float = 1e-5
    # the reference trunk is HF LlamaModel, whose attention is CAUSAL even
    # for this denoising use; keep True for checkpoint parity (the reference
    # also concatenates its attention mask as [x, cond] while the embeds go
    # [cond, x] — a latent misalignment under padding that we do not copy)
    causal: bool = True
    gradient_checkpointing: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, diffusion_step, conditioner, x_masks=None, cond_masks=None):
        b, t_mel = x.shape[0], x.shape[1]
        h = self.hidden_size

        if conditioner.ndim == 3 and conditioner.shape[-1] == 1:
            conditioner = conditioner[..., 0]
        conditioner = conditioner.astype(jnp.int32)
        t_cond = conditioner.shape[1]

        x_keep = (
            jnp.ones((b, t_mel), bool) if x_masks is None else ~x_masks
        )
        cond_keep = (
            jnp.ones((b, t_cond), bool) if cond_masks is None else ~cond_masks
        )

        token_embeds = nn.Embed(
            self.vocab_size, h, dtype=self.dtype, name="embed_tokens"
        )(conditioner)

        step = diffusion_embedding(diffusion_step, h, dtype=self.dtype)
        step = jnp.broadcast_to(step[:, None, :], (b, t_mel, h))

        mel_lens = jnp.log(
            jnp.maximum(x_keep.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0)
        )
        len_embeds = nn.Dense(h, dtype=self.dtype, name="mel_len_embedding")(
            mel_lens[:, :, None]
        )
        len_embeds = jnp.broadcast_to(len_embeds[:, 0][:, None, :], (b, t_mel, h))

        mel = nn.Dense(h, dtype=self.dtype, name="in_proj")(x.astype(self.dtype))
        merged = nn.Dense(h, dtype=self.dtype, name="merge_proj")(
            jnp.concatenate([step, len_embeds, mel], axis=-1)
        )

        seq = jnp.concatenate([token_embeds, merged], axis=1)
        attn_mask = jnp.concatenate([cond_keep, x_keep], axis=1)
        positions = jnp.arange(t_cond + t_mel)

        block_cls = LlamaBlock
        if self.gradient_checkpointing:
            block_cls = nn.remat(block_cls, prevent_cse=False)

        for i in range(self.num_hidden_layers):
            seq = block_cls(
                h,
                self.num_attention_heads,
                self.intermediate_size,
                self.rms_norm_eps,
                self.causal,
                self.dtype,
                name=f"layers_{i}",
            )(seq, positions, attn_mask)

        seq = RMSNorm(self.rms_norm_eps, self.dtype, name="norm")(seq)
        out = seq[:, -t_mel:, :]
        out = nn.Dense(
            self.diffusion_channels, dtype=self.dtype, name="out_proj"
        )(out)
        return out.astype(jnp.float32)
