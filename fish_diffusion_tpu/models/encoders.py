"""Condition encoders (parity with reference ``fish_diffusion/modules/encoders/``).

Implemented here: NaiveProjectionEncoder, IdentityEncoder,
QuantizedPitchEncoder, SimilarClusterEncoder. The FastSpeech2 FFT-block
encoder lives in ``fast_speech.py``.

``preprocessing`` accepts either a callable or a string naming a pitch
transform from ``ops.pitch`` — configs stay declarative/serializable that way
(the reference passes live function objects from configs,
``configs/_base_/archs/diff_svc_v2.py:55``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pitch as pitch_ops
from ..registry import ENCODERS

Dtype = Any

_PREPROCESSING_FNS = {
    "pitch_to_scale": pitch_ops.pitch_to_scale,
    "pitch_to_log": pitch_ops.pitch_to_log,
    "pitch_to_coarse": pitch_ops.pitch_to_coarse,
    "pitch_to_mel_scale": pitch_ops.pitch_to_mel_scale,
    "pitch_to_log_quant": pitch_ops.pitch_to_log_quant,
}


def resolve_preprocessing(
    preprocessing: Union[str, Callable, None]
) -> Optional[Callable]:
    if preprocessing is None or callable(preprocessing):
        return preprocessing
    if preprocessing in _PREPROCESSING_FNS:
        return _PREPROCESSING_FNS[preprocessing]
    raise KeyError(
        f"Unknown preprocessing {preprocessing!r}; "
        f"available: {sorted(_PREPROCESSING_FNS)}"
    )


@ENCODERS.register_module()
class NaiveProjectionEncoder(nn.Module):
    """Linear / Embedding / bottleneck projection encoder
    (reference ``modules/encoders/naive_projection.py:7-60``)."""

    input_size: int
    output_size: int
    use_embedding: bool = False
    use_neck: bool = False
    neck_size: int = 8
    preprocessing: Union[str, Callable, None] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, masks=None):
        fn = resolve_preprocessing(self.preprocessing)
        if fn is not None:
            x = fn(x)

        if self.use_embedding:
            # init matches reference: normal(0, dim**-0.5)
            return nn.Embed(
                self.input_size,
                self.output_size,
                embedding_init=nn.initializers.normal(self.output_size**-0.5),
                dtype=self.dtype,
                name="embedding",
            )(x.astype(jnp.int32))

        dense = lambda feats, name: nn.Dense(
            feats,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name=name,
        )

        x = x.astype(self.dtype)
        if self.use_neck:
            x = dense(self.neck_size, "projection_0")(x)
            return dense(self.output_size, "projection_1")(x)

        return dense(self.output_size, "projection")(x)


@ENCODERS.register_module()
class IdentityEncoder(nn.Module):
    """Pass-through (reference ``modules/encoders/identity.py:7``)."""

    @nn.compact
    def __call__(self, x, masks=None):
        return x


@ENCODERS.register_module()
class QuantizedPitchEncoder(nn.Module):
    """96 semitone bins @ 440 Hz with masked window-average pooling
    (reference ``modules/encoders/pitch_quant.py:9-77``)."""

    output_size: int
    win_length: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, signals, masks=None):
        if signals.ndim == 3 and signals.shape[-1] == 1:
            signals = signals.squeeze(-1)
        assert signals.ndim == 2, "input must be [batch, width]"

        signals = pitch_ops.pitch_quant(signals, self.win_length)

        bins = 440.0 * 2 ** ((jnp.arange(96) - 48) / 12)
        idx = jnp.argmin(jnp.abs(signals[..., None] - bins[None, None, :]), axis=-1)

        return nn.Embed(
            96,
            self.output_size,
            dtype=self.dtype,
            name="embedding",
        )(idx)


class BertLayer(nn.Module):
    """One post-LN BERT encoder block (HF BertLayer layout)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    layer_norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        h, n_heads = self.hidden_size, self.num_heads
        head_dim = h // n_heads
        B, L, _ = x.shape

        q = nn.Dense(h, dtype=self.dtype, name="q")(x)
        k = nn.Dense(h, dtype=self.dtype, name="k")(x)
        v = nn.Dense(h, dtype=self.dtype, name="v")(x)
        q = q.reshape(B, L, n_heads, head_dim)
        k = k.reshape(B, L, n_heads, head_dim)
        v = v.reshape(B, L, n_heads, head_dim)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, x.dtype)
        )
        probs = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, h)

        attn_out = nn.Dense(h, dtype=self.dtype, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="attn_ln")(x + attn_out)

        inter = jax.nn.gelu(
            nn.Dense(self.intermediate_size, dtype=self.dtype, name="intermediate")(x),
            approximate=False,  # HF "gelu" = exact erf form
        )
        out = nn.Dense(h, dtype=self.dtype, name="output")(inter)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="output_ln")(x + out)


@ENCODERS.register_module()
class BertEncoder(nn.Module):
    """Trainable flax BERT text encoder (reference
    ``modules/encoders/bert.py:10`` wraps HF AutoModel; here the net is
    native flax in the HF BertModel layout so it jits, shards and takes
    gradients inside an arch like any other encoder).

    Weights: convert a HF BERT checkpoint with
    ``tools/tts/convert_bert_checkpoint.py`` and load through the normal
    pretrained-surgery path. ``__call__(input_ids, masks)`` follows this
    framework's encoder convention (masks True = padding) and returns the
    projected, padding-zeroed hidden states — matching the reference's
    ``x * attention_mask`` (bert.py:33-44).
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    output_size: Optional[int] = None
    layer_norm_eps: float = 1e-12
    # parity kwargs with the reference config surface (weights come from the
    # converter, not the HF hub)
    model_name: Optional[str] = None
    pretrained: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, masks=None, token_type_ids=None):
        input_ids = jnp.asarray(input_ids)
        if input_ids.ndim == 3:  # [B, L, 1] from generic pipelines
            input_ids = input_ids[..., 0]
        input_ids = input_ids.astype(jnp.int32)
        B, L = input_ids.shape

        attention_mask = (
            jnp.ones((B, L), jnp.float32)
            if masks is None
            else 1.0 - masks.astype(jnp.float32)
        )

        we = nn.Embed(self.vocab_size, self.hidden_size, name="word_embeddings")(
            input_ids
        )
        pe = nn.Embed(
            self.max_position_embeddings, self.hidden_size, name="position_embeddings"
        )(jnp.arange(L))
        tt = (
            jnp.zeros_like(input_ids)
            if token_type_ids is None
            else token_type_ids.astype(jnp.int32)
        )
        te = nn.Embed(self.type_vocab_size, self.hidden_size, name="token_type_embeddings")(
            tt
        )
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="embeddings_ln")(
            we + pe[None, :, :] + te
        )

        # HF extended attention mask: 0 where attended, large negative at pad
        bias = (1.0 - attention_mask)[:, None, None, :] * jnp.asarray(
            -1e9, x.dtype
        )
        for i in range(self.num_layers):
            x = BertLayer(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.layer_norm_eps,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, bias)

        if self.output_size is not None and self.output_size != self.hidden_size:
            x = nn.Dense(self.output_size, dtype=self.dtype, name="proj")(x)

        return x * attention_mask[:, :, None].astype(x.dtype)


@ENCODERS.register_module()
class TransformerEncoder(nn.Module):
    """Plain transformer encoder wrapper
    (reference ``modules/encoders/transformer.py:7``): input projection +
    N post-norm self-attention layers."""

    input_size: int
    output_size: int
    num_layers: int = 4
    num_heads: int = 4
    dim_feedforward: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, masks=None):
        x = nn.Dense(self.output_size, dtype=self.dtype, name="input_proj")(
            x.astype(self.dtype)
        )
        attn_mask = None
        if masks is not None:
            attn_mask = (~masks)[:, None, None, :]

        for i in range(self.num_layers):
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype, name=f"attn_{i}"
            )(x, x, x, mask=attn_mask)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm1_{i}")(x + y)
            y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name=f"ff1_{i}")(x)
            y = nn.relu(y)
            y = nn.Dense(self.output_size, dtype=self.dtype, name=f"ff2_{i}")(y)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm2_{i}")(x + y)
        return x


@ENCODERS.register_module()
class SimilarClusterEncoder(nn.Module):
    """Learnable cluster-snap encoder
    (reference ``modules/encoders/similar_cluster.py:10``): inputs are
    softly assigned to the nearest learned cluster center, then projected."""

    input_size: int
    output_size: int
    n_clusters: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, masks=None):
        centers = self.param(
            "clusters",
            nn.initializers.normal(1.0),
            (self.n_clusters, self.input_size),
            jnp.float32,
        )
        x = x.astype(self.dtype)
        # squared distances via (x-c)^2 = x^2 - 2xc + c^2 (MXU matmul form)
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)
        c2 = jnp.sum(centers * centers, axis=-1)
        xc = jnp.einsum("btc,kc->btk", x, centers.astype(self.dtype))
        dist = x2 - 2 * xc + c2[None, None, :]
        idx = jnp.argmin(dist, axis=-1)
        snapped = centers.astype(self.dtype)[idx]
        # straight-through: forward snapped, backward identity
        snapped = x + jax.lax.stop_gradient(snapped - x)
        return nn.Dense(
            self.output_size,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="projection",
        )(snapped)
