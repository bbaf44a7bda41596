"""Content feature extractors, TPU-native.

Capability parity with the reference
``fish_diffusion/modules/feature_extractors/``:
- ``BaseFeatureExtractor`` (base.py:7-35): resample to the model's rate,
  forward -> [1, C, T_features]
- ``HubertSoft`` (hubert_soft.py:8): bshall HuBERT-Soft (256-d soft units)
- ``ContentVec`` (content_vec.py:16-54): HuBERT layer-9 hiddens + final_proj
- ``ChineseHubertSoft`` (chinese_hubert.py:11): HuBERT + 256 proj + top-k
  sparse gating
- ``OpenCpopTranscriptionToPhonemesDuration`` (opencpop_transcription.py:12):
  one-hot phonemes + duration-cumsum phones2mel map (no NN)

The HuBERT tower is ONE flax module (`HubertEncoder`) configured per
variant; the reference pulls pretrained torch weights from torch.hub / HF at
ctor time (hubert_soft.py:11, chinese_hubert.py:32-35) — here weights come
from explicit artifact files produced by
``tools/preprocessing/convert_hubert_checkpoint.py`` (no network access at
runtime, SURVEY.md §7 "explicit artifact management").
"""

from __future__ import annotations

import pickle
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import FEATURE_EXTRACTORS

Dtype = Any


def resample_linear(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Linear-interpolation resampling (host-side, preprocessing-time)."""
    if orig_sr == target_sr:
        return audio
    new_len = int(round(len(audio) * target_sr / orig_sr))
    return np.interp(
        np.linspace(0, len(audio) - 1, new_len), np.arange(len(audio)), audio
    ).astype(np.float32)


class BaseFeatureExtractor:
    """reference base.py:7-35: preprocess resamples to self.sampling_rate."""

    sampling_rate: int = 16000

    def preprocess(self, audio: np.ndarray, sampling_rate: int) -> np.ndarray:
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 2:
            audio = audio.mean(0)
        return resample_linear(audio, sampling_rate, self.sampling_rate)

    def __call__(self, audio, sampling_rate) -> np.ndarray:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# HuBERT tower (flax)
# ---------------------------------------------------------------------------


class ConvFeatureExtractor(nn.Module):
    """wav2vec2/HuBERT conv waveform encoder: 7 strided convs, GELU,
    group-norm on the first layer. [B, T_samples] -> [B, T_frames, 512]."""

    conv_layers: Sequence[Tuple[int, int, int]] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x[:, :, None]  # [B, T, 1]
        for i, (ch, k, s) in enumerate(self.conv_layers):
            x = nn.Conv(
                ch,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(
                    num_groups=ch, epsilon=1e-5, dtype=self.dtype,
                    name="group_norm",
                )(x)
            x = nn.gelu(x, approximate=False)
        return x


class TransformerLayer(nn.Module):
    dim: int
    heads: int
    ffn_dim: int
    layer_norm_first: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.layer_norm_first:
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype, name="attn"
            )(y, y, y)
            x = x + y
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
            y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
            x = x + y
        else:
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype, name="attn"
            )(x, x, x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + y)
            y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + y)
        return x


class HubertEncoder(nn.Module):
    """HuBERT/wav2vec2-style encoder. [B, T_samples] -> hidden states of
    every transformer layer (list) so variants can tap intermediate layers
    (ContentVec uses layer 9, content_vec.py:40-44)."""

    dim: int = 768
    num_layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    layer_norm_first: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio):
        x = ConvFeatureExtractor(dtype=self.dtype, name="feature_extractor")(audio)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="feat_norm")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="feature_projection")(x)

        # convolutional relative positional embedding (k=128, groups=16)
        pos = nn.Conv(
            self.dim,
            kernel_size=(128,),
            padding=[(64, 64)],
            feature_group_count=16,
            dtype=self.dtype,
            name="pos_conv",
        )(x)[:, : x.shape[1]]
        x = x + nn.gelu(pos, approximate=False)

        if not self.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_norm")(x)

        hiddens = []
        for i in range(self.num_layers):
            x = TransformerLayer(
                self.dim,
                self.heads,
                self.ffn_dim,
                self.layer_norm_first,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x)
            hiddens.append(x)
        return hiddens


class _HubertExtractorBase(BaseFeatureExtractor):
    """Shared machinery: params loading, jitted forward, [1, C, T] output."""

    sampling_rate = 16000

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        random_init: bool = False,
        **encoder_kwargs,
    ):
        self.encoder = HubertEncoder(**encoder_kwargs)
        self.params = None
        if checkpoint_path:
            with open(checkpoint_path, "rb") as f:
                self.params = pickle.load(f)
        self._forward = jax.jit(self._forward_impl)
        if random_init and self.params is None:
            self.init_random()

    def init_random(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, 16000))
        # jitted: eager flax init of the 12-layer tower runs op-by-op over
        # the device tunnel (minutes vs seconds)
        self.params = jax.jit(self.encoder.init)(rng, dummy)["params"]
        # head params
        head = self._init_head(rng)
        if head:
            self.params = {**self.params, **head}
        return self.params

    def _init_head(self, rng):
        return {}

    def _forward_impl(self, params, audio):
        raise NotImplementedError

    def __call__(self, audio, sampling_rate=44100) -> np.ndarray:
        assert self.params is not None, (
            f"{type(self).__name__} has no weights; convert a torch checkpoint "
            "with tools/preprocessing/convert_hubert_checkpoint.py or call "
            "init_random() for testing"
        )
        audio = self.preprocess(audio, sampling_rate)
        feats = self._forward(self.params, jnp.asarray(audio)[None])
        return np.asarray(jnp.swapaxes(feats, 1, 2))  # [1, C, T]


@FEATURE_EXTRACTORS.register_module()
class HubertSoft(_HubertExtractorBase):
    """bshall HuBERT-Soft: full tower + 256-d soft-unit projection
    (reference hubert_soft.py:8-29)."""

    def __init__(self, checkpoint_path: Optional[str] = None, **kwargs):
        self.proj = nn.Dense(256, name="soft_proj")
        super().__init__(checkpoint_path, layer_norm_first=False, **kwargs)

    def _init_head(self, rng):
        hidden = jnp.zeros((1, 10, 768))
        return {
            "soft_proj": self.proj.init(jax.random.fold_in(rng, 1), hidden)[
                "params"
            ]
        }

    def _forward_impl(self, params, audio):
        enc_params = {k: v for k, v in params.items() if k != "soft_proj"}
        hiddens = self.encoder.apply({"params": enc_params}, audio)
        return self.proj.apply({"params": params["soft_proj"]}, hiddens[-1])


@FEATURE_EXTRACTORS.register_module()
class ContentVec(_HubertExtractorBase):
    """ContentVec: layer-9 hidden states + final_proj to 256
    (reference content_vec.py:16-54)."""

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        output_layer: int = 9,
        use_projection: bool = True,
        **kwargs,
    ):
        self.output_layer = output_layer
        self.use_projection = use_projection
        self.final_proj = nn.Dense(256, name="final_proj")
        super().__init__(checkpoint_path, layer_norm_first=True, **kwargs)

    def _init_head(self, rng):
        if not self.use_projection:
            return {}
        hidden = jnp.zeros((1, 10, 768))
        return {
            "final_proj": self.final_proj.init(
                jax.random.fold_in(rng, 2), hidden
            )["params"]
        }

    def _forward_impl(self, params, audio):
        enc_params = {k: v for k, v in params.items() if k != "final_proj"}
        hiddens = self.encoder.apply({"params": enc_params}, audio)
        feats = hiddens[self.output_layer - 1]
        if self.use_projection:
            feats = self.final_proj.apply(
                {"params": params["final_proj"]}, feats
            )
        return feats


@FEATURE_EXTRACTORS.register_module()
class ChineseHubert(_HubertExtractorBase):
    """Chinese HuBERT, raw hidden states (reference chinese_hubert.py:67)."""

    def __init__(self, checkpoint_path: Optional[str] = None, output_layer: int = -1,
                 **kwargs):
        self.output_layer = output_layer
        super().__init__(checkpoint_path, layer_norm_first=True, **kwargs)

    def _forward_impl(self, params, audio):
        hiddens = self.encoder.apply({"params": params}, audio)
        return hiddens[self.output_layer]


@FEATURE_EXTRACTORS.register_module()
class ChineseHubertSoft(_HubertExtractorBase):
    """Chinese HuBERT + 256 proj + top-k sparse gating
    (reference chinese_hubert.py:11-64: keeps the top-k channels per frame,
    zeroing the rest)."""

    def __init__(self, checkpoint_path: Optional[str] = None, gate_size: int = 10,
                 **kwargs):
        self.gate_size = gate_size
        self.proj = nn.Dense(256, name="soft_proj")
        super().__init__(checkpoint_path, layer_norm_first=True, **kwargs)

    def _init_head(self, rng):
        hidden = jnp.zeros((1, 10, 768))
        return {
            "soft_proj": self.proj.init(jax.random.fold_in(rng, 3), hidden)[
                "params"
            ]
        }

    def _forward_impl(self, params, audio):
        enc_params = {k: v for k, v in params.items() if k != "soft_proj"}
        hiddens = self.encoder.apply({"params": enc_params}, audio)
        feats = self.proj.apply({"params": params["soft_proj"]}, hiddens[-1])

        # top-k sparse gating over channels
        topk_vals, _ = jax.lax.top_k(feats, self.gate_size)
        threshold = topk_vals[..., -1:]
        return jnp.where(feats >= threshold, feats, 0.0)


# ---------------------------------------------------------------------------
# Transcription-based extractor (SVS; no NN)
# ---------------------------------------------------------------------------


@FEATURE_EXTRACTORS.register_module()
class CMVNMelExtractor(BaseFeatureExtractor):
    """Speaker-normalized log-mel content features: per-utterance,
    per-bin cepstral mean-variance normalization (CMVN) of the log-mel.

    Subtracting each mel bin's utterance mean removes static timbre —
    spectral tilt and any constant multiplicative emphasis (additive in
    log-mel) — while time-varying phonetic content survives; dividing by
    the per-bin std equalizes dynamic range. This is the classic
    speaker-normalization front-end, provided as a weight-free stand-in
    for the pretrained content towers (HuBERT-soft, reference
    ``modules/feature_extractors/hubert_soft.py:8``) in environments
    without network access to checkpoints; it drives the end-to-end
    conversion proof (``tools/diffusion/prove_conversion.py``).

    The normalization statistics are energy-gated (frames within
    ``active_range`` natural-log units of the utterance peak): callers
    hand the extractor bucket-padded audio (static-shape discipline), and
    ungated stats would vary with the padding fraction. Gating makes the
    features invariant to padding and leading/trailing silence.

    Output: ``[1, n_mels, T]`` float32 at the mel frame rate, so the
    preprocessing pipeline's repeat_expand to mel length is exact.
    """

    def __init__(
        self,
        sampling_rate: int = 44100,
        n_mels: int = 128,
        hop_length: int = 512,
        eps: float = 0.1,
        active_range: float = 10.0,
    ):
        # eps floors the per-bin std: log-mel bins that are near-constant
        # in time (held notes, silence-adjacent bins) would otherwise blow
        # up under 1/std and amplify boundary-frame noise; typical voiced
        # bins have std 1-3 log units, so 0.1 is far below signal scale
        from ..ops.mel import LogMelSpectrogram

        self.sampling_rate = sampling_rate
        self.hop_length = hop_length
        self.eps = eps
        self._mel = LogMelSpectrogram(
            sample_rate=sampling_rate, n_mels=n_mels, hop_length=hop_length
        )

        def _forward(audio):
            mel = self._mel.wav2spec(audio)  # [1, M, T]
            energy = jnp.max(mel, axis=1, keepdims=True)  # [1, 1, T]
            active = (
                energy > jnp.max(energy, axis=-1, keepdims=True) - active_range
            ).astype(mel.dtype)
            n = jnp.maximum(jnp.sum(active, axis=-1, keepdims=True), 1.0)
            mean = jnp.sum(mel * active, axis=-1, keepdims=True) / n
            var = jnp.sum(((mel - mean) ** 2) * active, axis=-1, keepdims=True) / n
            return (mel - mean) / (jnp.sqrt(var) + eps)

        self._forward = jax.jit(_forward)

    def __call__(self, audio, sampling_rate=44100) -> np.ndarray:
        audio = self.preprocess(audio, sampling_rate)
        return np.asarray(self._forward(jnp.asarray(audio)[None]))


@FEATURE_EXTRACTORS.register_module()
class OpenCpopTranscriptionToPhonemesDuration(BaseFeatureExtractor):
    """One-hot phonemes + duration-cumsum phones2mel map
    (reference opencpop_transcription.py:12-59)."""

    def __init__(self, phonemes: list, transcription_path: str):
        self.phonemes = list(phonemes)
        self.transcription_path = transcription_path

        self.transcriptions = {}
        with open(transcription_path, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split("|")
                if len(parts) < 6:
                    continue
                name, _text, _py, phones, _notes, durations = parts[:6]
                self.transcriptions[name] = (
                    phones.split(" "),
                    [float(d) for d in durations.split(" ")],
                )

    def __call__(self, name: str, mel_len: int, hop_length=512, sampling_rate=44100):
        phones, durations = self.transcriptions[name]
        ids = np.array([self.phonemes.index(p) for p in phones], np.int64)

        cumsum = np.cumsum(durations)
        frame_times = np.arange(mel_len) * hop_length / sampling_rate
        phones2mel = np.searchsorted(cumsum, frame_times, side="right")
        phones2mel = np.clip(phones2mel, 0, len(phones) - 1)

        onehot = np.zeros((len(self.phonemes), len(phones)), np.float32)
        onehot[ids, np.arange(len(phones))] = 1.0

        return onehot, ids, phones2mel.astype(np.int64)
