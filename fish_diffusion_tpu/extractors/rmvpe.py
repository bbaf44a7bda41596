"""RMVPE learned pitch extractor, TPU-native flax port.

Capability parity with the reference
``fish_diffusion/modules/pitch_extractors/rmvpe.py`` (vendored RMVPE, MIT):
- DeepUnet: 5-layer residual conv encoder (2x2 avg pool) + 4 intermediate
  blocks + 5-layer convtranspose decoder with skip concat (:29-226)
- E2E head: conv to 3 channels, BiGRU(384->2x256) + Linear->360-bin
  salience with sigmoid (:228-263)
- htk-mel front end: 128 mels @ 16 kHz, win 1024, hop 160, fmin 30,
  fmax 8000, log-clamped (:266-330)
- decoding: local-average cents around the argmax bin, f0 = 10*2^(c/1200),
  threshold-gated voicing (:404-430)

Weights: convert the released ``rmvpe.pt`` with
``tools/preprocessing/convert_rmvpe_checkpoint.py`` (the reference downloads
it from HF at ctor time; this framework uses explicit artifacts).

Inference-only: BatchNorm runs with converted running statistics.
"""

from __future__ import annotations

import pickle
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.mel import stft_magnitude
from ..registry import PITCH_EXTRACTORS
from .pitch import BasePitchExtractor

Dtype = Any

N_MELS, N_CLASS = 128, 360


def htk_mel_filter_bank(
    sample_rate=16000, n_fft=1024, n_mels=128, f_min=30.0, f_max=8000.0
) -> np.ndarray:
    """librosa mel with htk=True, no norm... librosa default norm='slaney';
    the RMVPE front end uses librosa defaults except htk=True
    (reference rmvpe.py:284-291)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    fftfreqs = np.linspace(0, sample_rate / 2, 1 + n_fft // 2)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


class ConvBlockRes(nn.Module):
    """Two conv+BN+relu with residual (reference :30-64). Inference BN."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, momentum=0.99,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, momentum=0.99,
                         name="bn2")(y)
        y = nn.relu(y)

        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return y + x


class ResEncoderBlock(nn.Module):
    out_channels: int
    n_blocks: int = 1
    pool: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"block_{i}")(x)
        if self.pool is not None:
            pooled = nn.avg_pool(x, self.pool, strides=self.pool)
            return x, pooled
        return x


class ResDecoderBlock(nn.Module):
    out_channels: int
    stride: Tuple[int, int] = (2, 2)
    n_blocks: int = 1

    @nn.compact
    def __call__(self, x, skip):
        # torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1)
        # doubles spatial dims; flax equivalent with matching edge padding
        x = nn.ConvTranspose(
            self.out_channels,
            (3, 3),
            strides=self.stride,
            padding=[(1, 2), (1, 2)],
            transpose_kernel=True,
            use_bias=False,
            name="upconv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.99, name="bn")(x)
        x = nn.relu(x)
        x = jnp.concatenate([x[:, : skip.shape[1], : skip.shape[2]], skip], axis=-1)
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_channels, name=f"block_{i}")(x)
        return x


class DeepUnet(nn.Module):
    """reference :198-226. NHWC: [B, T, 128, C]."""

    n_blocks: int = 4
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, x):
        x = nn.BatchNorm(use_running_average=True, momentum=0.99,
                         name="in_bn")(x)

        skips = []
        ch = self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(
                ch, self.n_blocks, pool=(2, 2), name=f"enc_{i}"
            )(x)
            skips.append(skip)
            ch *= 2

        # intermediate: first expands ch//2 -> ch
        for i in range(self.inter_layers):
            x = ResEncoderBlock(ch, self.n_blocks, name=f"inter_{i}")(x)

        for i in range(self.en_de_layers):
            ch //= 2
            x = ResDecoderBlock(ch, (2, 2), self.n_blocks, name=f"dec_{i}")(
                x, skips[-1 - i]
            )
        return x


class BiGRU(nn.Module):
    """Bidirectional GRU (reference :15-27): two scans, concat outputs."""

    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        # cell params are lifted into this module's scope under the cell name
        fwd = nn.RNN(nn.GRUCell(self.hidden, name="fwd_cell"))(x)
        bwd = nn.RNN(
            nn.GRUCell(self.hidden, name="bwd_cell"), reverse=True, keep_order=True
        )(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class E2E(nn.Module):
    """reference :228-263. mel [B, T, 128] -> salience [B, T, 360]."""

    n_blocks: int = 4
    n_gru: int = 1

    @nn.compact
    def __call__(self, mel):
        x = mel[..., None]  # [B, T, 128, 1] NHWC
        x = DeepUnet(self.n_blocks, name="unet")(x)
        x = nn.Conv(3, (3, 3), padding=1, name="cnn")(x)  # [B, T, 128, 3]
        b, t = x.shape[:2]
        # flatten channel-major (c*128 + m) to match the torch layout
        # (reference rmvpe.py: .transpose(1, 2).flatten(-2) on NCHW)
        x = jnp.swapaxes(x, 2, 3).reshape(b, t, -1)  # [B, T, 384]
        x = BiGRU(256, name="gru")(x)
        x = nn.Dense(N_CLASS, name="fc")(x)
        return jax.nn.sigmoid(x)


@PITCH_EXTRACTORS.register_module()
class RMVPitchExtractor(BasePitchExtractor):
    """reference :336-430."""

    def __init__(
        self,
        hop_length: int = 512,
        f0_min: float = 50.0,
        f0_max: float = 1100.0,
        keep_zeros: bool = False,
        threshold: float = 0.03,
        checkpoint_path: Optional[str] = None,
        random_init: bool = False,
    ):
        super().__init__(hop_length, f0_min, f0_max, keep_zeros)
        self.threshold = threshold
        self.model = E2E(4, 1)

        self.variables = None
        if checkpoint_path:
            with open(checkpoint_path, "rb") as f:
                self.variables = pickle.load(f)

        self._mel_basis = htk_mel_filter_bank()
        cents_mapping = 20 * np.arange(N_CLASS) + 1997.3794084376191
        self.cents_mapping = np.pad(cents_mapping, (4, 4))

        self._forward = jax.jit(
            lambda v, mel: self.model.apply(v, mel)
        )

        if random_init and self.variables is None:
            self.init_random()

    def init_random(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # jitted: eager flax init runs op-by-op over the device tunnel
        self.variables = jax.jit(self.model.init)(rng, jnp.zeros((1, 32, N_MELS)))
        return self.variables

    def _mel(self, audio16k: np.ndarray) -> np.ndarray:
        """htk log-mel @16k, hop 160 (reference MelSpectrogram :266-330)."""
        mag = stft_magnitude(
            jnp.asarray(audio16k)[None], 1024, 160, 1024, center=True, eps=0.0
        )
        mel = jnp.einsum("mf,bft->bmt", jnp.asarray(self._mel_basis), mag)
        return jnp.log(jnp.clip(mel, 1e-5, None))

    def to_local_average_cents(self, salience: np.ndarray) -> np.ndarray:
        """Weighted average of cents around the argmax bin (reference
        :404-424)."""
        center = np.argmax(salience, axis=1)
        salience = np.pad(salience, ((0, 0), (4, 4)))
        center = center + 4

        T = salience.shape[0]
        idx = center[:, None] + np.arange(-4, 5)[None, :]
        sal = np.take_along_axis(salience, idx, axis=1)
        cents = self.cents_mapping[idx]
        product = (sal * cents).sum(axis=1)
        weight = sal.sum(axis=1)
        avg = product / np.maximum(weight, 1e-9)

        max_sal = salience.max(axis=1)
        avg[max_sal <= self.threshold] = 0.0
        return avg

    def __call__(self, x, sampling_rate=44100, pad_to=None):
        assert self.variables is not None, (
            "RMVPE has no weights; convert rmvpe.pt with "
            "tools/preprocessing/convert_rmvpe_checkpoint.py"
        )
        from .feature import resample_linear

        audio = resample_linear(
            np.asarray(x, np.float32).reshape(-1), sampling_rate, 16000
        )

        mel = np.asarray(self._mel(audio))[0].T  # [T, 128]
        n_frames = mel.shape[0]
        pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
        mel = np.pad(mel, ((0, pad), (0, 0)), mode="reflect")

        hidden = np.asarray(self._forward(self.variables, mel[None]))[0]
        hidden = hidden[:n_frames]

        cents = self.to_local_average_cents(hidden)
        f0 = 10 * 2 ** (cents / 1200)
        f0[f0 == 10] = 0

        return self.post_process(x, sampling_rate, f0, pad_to)
