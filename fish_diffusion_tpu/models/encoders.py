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


@ENCODERS.register_module()
class BertEncoder:
    """HF BERT text encoder (reference ``modules/encoders/bert.py:10``).

    A preprocessing-time component (runs on tokenized text, not in the jit
    hot path); loads from a LOCAL model directory — HF hub access needs
    network, which production TPU pods often lack.
    """

    def __init__(self, model_name: str = "bert-base-cased", pretrained: bool = True):
        self.model_name = model_name
        self.pretrained = pretrained
        self._model = None
        self._tokenizer = None

    def _load(self):
        if self._model is None:
            from transformers import AutoModel, AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(self.model_name)
            self._model = AutoModel.from_pretrained(self.model_name)
            self._model.eval()
        return self._model, self._tokenizer

    def __call__(self, texts, masks=None):
        import numpy as np
        import torch

        model, tokenizer = self._load()
        enc = tokenizer(list(texts), return_tensors="pt", padding=True)
        with torch.no_grad():
            out = model(**enc).last_hidden_state
        return np.asarray(out)


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
