"""Aligned Whisper: phone/audio features in a shared space, TPU-native flax.

Capability parity with the reference
``fish_diffusion/modules/feature_extractors/whisper.py``:
- ``PartialFreezedAudioEncoder`` (:52-78): the Whisper audio encoder
  (conv k3 + conv k3/stride2, sinusoidal positions, pre-LN attention
  blocks, ln_post) with only the last N blocks trainable
- ``PhoneEncoder`` (:20-49): phone embedding + sinusoidal positions +
  attention blocks
- ``AlignedWhisper`` (:80-240): audio_proj / phone_proj into a shared
  ``n_outputs`` space + phone_decoder head; save/load with a dims dict
- ``AlignedWhisperForAudio`` / ``AlignedWhisperForPhones`` extractors

Partial freezing is expressed TPU-natively as an optax mask (see
``trainable_mask``) instead of requires_grad flags. The Whisper log-mel
front end (80 mels @16 kHz, n_fft 400, hop 160) is implemented with the
framework's conv-as-GEMM STFT.
"""

from __future__ import annotations

import math
import pickle
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.mel import stft_magnitude
from ..registry import FEATURE_EXTRACTORS
from .feature import BaseFeatureExtractor

Dtype = Any

WHISPER_SR = 16000
WHISPER_N_FFT = 400
WHISPER_HOP = 160
WHISPER_N_MELS = 80
WHISPER_CTX_FRAMES = 3000


def sinusoids(length: int, channels: int, max_timescale: float = 10000) -> np.ndarray:
    """Whisper's sinusoid table: [sin | cos] concatenated over channels."""
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(
        -log_timescale_increment * np.arange(channels // 2, dtype=np.float64)
    )
    scaled_time = (
        np.arange(length, dtype=np.float64)[:, None] * inv_timescales[None, :]
    )
    return np.concatenate(
        [np.sin(scaled_time), np.cos(scaled_time)], axis=1
    ).astype(np.float32)


def whisper_log_mel(audio: np.ndarray) -> jnp.ndarray:
    """OpenAI Whisper log_mel_spectrogram equivalent: slaney mel over
    |stft|^2 with log10, clamped to max-8, scaled (x+4)/4."""
    from ..ops.mel import mel_filter_bank

    mag = stft_magnitude(
        jnp.asarray(audio)[None],
        WHISPER_N_FFT,
        WHISPER_HOP,
        WHISPER_N_FFT,
        center=True,
        eps=0.0,
    )[:, :, :-1]  # whisper drops the last frame
    power = mag**2
    fb = jnp.asarray(
        mel_filter_bank(WHISPER_SR, WHISPER_N_FFT, WHISPER_N_MELS, 0.0, 8000.0)
    )
    mel = jnp.einsum("mf,bft->bmt", fb, power)
    log_spec = jnp.log10(jnp.clip(mel, 1e-10, None))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0  # [1, 80, T]


class ResidualAttentionBlock(nn.Module):
    """Whisper pre-LN block: MHA + GELU MLP."""

    n_state: int
    n_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, name="attn_ln", dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, dtype=self.dtype, name="attn"
        )(y, y, y)
        x = x + y

        y = nn.LayerNorm(epsilon=1e-5, name="mlp_ln", dtype=self.dtype)(x)
        y = nn.Dense(self.n_state * 4, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.n_state, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class WhisperAudioEncoder(nn.Module):
    """Whisper AudioEncoder: 2 convs (second stride 2) + sinusoids + blocks."""

    n_mels: int = 80
    n_ctx: int = 1500
    n_state: int = 384
    n_head: int = 6
    n_layer: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        """mel [B, n_mels, T] -> [B, T//2, n_state]."""
        x = jnp.swapaxes(mel, 1, 2).astype(self.dtype)  # [B, T, n_mels]
        x = nn.Conv(self.n_state, (3,), padding=[(1, 1)], name="conv1",
                    dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.n_state, (3,), strides=(2,), padding=[(1, 1)],
                    name="conv2", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)

        pos = jnp.asarray(sinusoids(self.n_ctx, self.n_state))
        x = x + pos[None, : x.shape[1]]

        for i in range(self.n_layer):
            x = ResidualAttentionBlock(
                self.n_state, self.n_head, self.dtype, name=f"blocks_{i}"
            )(x)

        return nn.LayerNorm(epsilon=1e-5, name="ln_post", dtype=self.dtype)(x)


class PhoneEncoder(nn.Module):
    """reference whisper.py:20-49."""

    n_phones: int
    n_ctx: int
    n_state: int = 384
    n_head: int = 4
    n_layer: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, phones):
        x = nn.Embed(self.n_phones, self.n_state, dtype=self.dtype, name="proj")(
            phones.astype(jnp.int32)
        )
        x = nn.gelu(x, approximate=False)
        pos = jnp.asarray(sinusoids(self.n_ctx, self.n_state))
        x = x + pos[None, : x.shape[1]]
        for i in range(self.n_layer):
            x = ResidualAttentionBlock(
                self.n_state, self.n_head, self.dtype, name=f"blocks_{i}"
            )(x)
        return nn.LayerNorm(epsilon=1e-5, name="ln_post", dtype=self.dtype)(x)


class AlignedWhisper(nn.Module):
    """reference whisper.py:80-240."""

    n_mels: int = 80
    n_phones: int = 100
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_audio_trainable_layers: int = 2
    n_phone_state: int = 384
    n_phone_head: int = 4
    n_phone_layer: int = 2
    n_outputs: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.audio_encoder = WhisperAudioEncoder(
            self.n_mels,
            self.n_audio_ctx,
            self.n_audio_state,
            self.n_audio_head,
            self.n_audio_layer,
            self.dtype,
        )
        self.phone_encoder = PhoneEncoder(
            self.n_phones,
            self.n_audio_ctx,
            self.n_phone_state,
            self.n_phone_head,
            self.n_phone_layer,
            self.dtype,
        )
        self.audio_proj = nn.Dense(self.n_outputs, dtype=self.dtype)
        self.phone_proj = nn.Dense(self.n_outputs, dtype=self.dtype)
        self.phone_decoder_1 = nn.Dense(self.n_outputs // 2, dtype=self.dtype)
        self.phone_decoder_2 = nn.Dense(self.n_phones, dtype=self.dtype)

    def forward_audio(self, mel):
        return self.audio_proj(self.audio_encoder(mel))

    def forward_phones(self, phones):
        return self.phone_proj(self.phone_encoder(phones))

    def forward_decoder(self, x):
        return self.phone_decoder_2(self.phone_decoder_1(x))

    def __call__(self, mel, phones):
        audio_emb = self.forward_audio(mel)
        phone_emb = self.forward_phones(phones)
        # touch the CE decoder head so flax init creates its params (the
        # aligner trainer's aux loss path, reference tools/whisper/train.py)
        _ = self.forward_decoder(audio_emb)
        return audio_emb, phone_emb

    def trainable_mask(self, params):
        """optax mask: True for trainable leaves — the last
        ``n_audio_trainable_layers`` audio blocks, ln_post, and every
        non-audio-encoder module (the TPU-native requires_grad)."""
        trainable_blocks = {
            f"blocks_{i}"
            for i in range(
                self.n_audio_layer - self.n_audio_trainable_layers,
                self.n_audio_layer,
            )
        }

        def mask_fn(path, _):
            keys = [str(getattr(p, "key", p)) for p in path]
            if "audio_encoder" not in keys:
                return True
            return any(k in trainable_blocks or k == "ln_post" for k in keys)

        return jax.tree_util.tree_map_with_path(mask_fn, params)


@FEATURE_EXTRACTORS.register_module()
class AlignedWhisperForAudio(BaseFeatureExtractor):
    """reference whisper.py:246-276: audio -> aligned features [1, C, T]."""

    sampling_rate = WHISPER_SR

    def __init__(self, checkpoint: Optional[str] = None, checkpoint_path=None,
                 random_init: bool = False, **dims):
        checkpoint = checkpoint_path or checkpoint
        self.model = AlignedWhisper(**dims)
        self.params = None
        if checkpoint:
            with open(checkpoint, "rb") as f:
                saved = pickle.load(f)
            if "dims" in saved:
                self.model = AlignedWhisper(**saved["dims"])
            self.params = saved["params"]

        self._forward = jax.jit(
            lambda p, mel: self.model.apply(
                {"params": p}, mel, method=self.model.forward_audio
            )
        )
        if random_init and self.params is None:
            self.init_random()

    def init_random(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        mel = jnp.zeros((1, self.model.n_mels, 32))
        phones = jnp.zeros((1, 16), jnp.int32)
        # jitted: eager flax init runs op-by-op over the device tunnel
        self.params = jax.jit(self.model.init)(rng, mel, phones)["params"]
        return self.params

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "params": self.params,
                    "dims": dict(
                        n_mels=self.model.n_mels,
                        n_phones=self.model.n_phones,
                        n_audio_ctx=self.model.n_audio_ctx,
                        n_audio_state=self.model.n_audio_state,
                        n_audio_head=self.model.n_audio_head,
                        n_audio_layer=self.model.n_audio_layer,
                        n_audio_trainable_layers=self.model.n_audio_trainable_layers,
                        n_phone_state=self.model.n_phone_state,
                        n_phone_head=self.model.n_phone_head,
                        n_phone_layer=self.model.n_phone_layer,
                        n_outputs=self.model.n_outputs,
                    ),
                },
                f,
            )

    def __call__(self, audio, sampling_rate=44100):
        assert self.params is not None, "no AlignedWhisper weights loaded"
        audio = self.preprocess(audio, sampling_rate)
        mel = whisper_log_mel(audio)  # [1, 80, T]
        feature_len = mel.shape[-1] // 2

        # pad_or_trim to the 30 s context
        T = mel.shape[-1]
        if T < WHISPER_CTX_FRAMES:
            mel = jnp.pad(mel, ((0, 0), (0, 0), (0, WHISPER_CTX_FRAMES - T)))
        else:
            mel = mel[:, :, :WHISPER_CTX_FRAMES]

        feats = self._forward(self.params, mel)[:, :feature_len]
        return np.asarray(jnp.swapaxes(feats, 1, 2))  # [1, C, T]


@FEATURE_EXTRACTORS.register_module()
class AlignedWhisperForPhones(AlignedWhisperForAudio):
    """reference whisper.py:278-305: phone ids -> aligned features."""

    def __init__(self, checkpoint: Optional[str] = None, checkpoint_path=None,
                 random_init: bool = False, **dims):
        super().__init__(checkpoint, checkpoint_path, random_init, **dims)
        self._forward_phones = jax.jit(
            lambda p, phones: self.model.apply(
                {"params": p}, phones, method=self.model.forward_phones
            )
        )

    def __call__(self, phones, sampling_rate=None):
        assert self.params is not None, "no AlignedWhisper weights loaded"
        phones = jnp.asarray(np.asarray(phones), jnp.int32)
        if phones.ndim == 1:
            phones = phones[None]
        feats = self._forward_phones(self.params, phones)
        return np.asarray(jnp.swapaxes(feats, 1, 2))
