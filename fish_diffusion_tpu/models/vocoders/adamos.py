"""ADaMoS-HiFiGAN: mel -> waveform without F0, TPU-native.

Capability parity with the reference
``fish_diffusion/modules/vocoders/adamos/``:
- ``ConvNeXtEncoder`` backbone (encoder.py:163-238): stem conv + LN,
  per-stage channel projections, ConvNeXt blocks (depths 3,3,9,3)
- ``HiFiGANGenerator`` head (hifigan.py:115-236): SiLU activations, 7
  upsamples from 1024 channels, no source template
- wrapper ``ADaMoSHiFiGANV1`` (adamos.py:15-108) with spec2wav/wav2spec

Used for TTS where no pitch is available. Channels-last [B, T, C].
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.mel import LogMelSpectrogram
from ...registry import VOCODERS
from .nsf_hifigan import ResBlock1, _get_padding

Dtype = Any


class ADaMoSConvNeXtBlock(nn.Module):
    """Unconditional ConvNeXt-1D block (reference adamos/encoder.py:75-130)."""

    dim: int
    layer_scale_init_value: float = 1e-6
    mlp_ratio: int = 4
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.dim,
            kernel_size=(self.kernel_size,),
            padding=[(pad, pad)],
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)

        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
                jnp.float32,
            )
            x = gamma.astype(self.dtype) * x

        return residual + x


class ParallelADaMoSBlock(nn.Module):
    """Multiple kernel sizes fused by averaging
    (reference adamos/encoder.py ParallelConvNeXtBlock)."""

    dim: int
    kernel_sizes: Sequence[int] = (3, 7)
    layer_scale_init_value: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = [
            ADaMoSConvNeXtBlock(
                self.dim,
                self.layer_scale_init_value,
                kernel_size=k,
                dtype=self.dtype,
                name=f"k{k}",
            )(x)
            for k in self.kernel_sizes
        ]
        return sum(outs) / len(outs)


class ConvNeXtEncoder(nn.Module):
    """reference adamos/encoder.py:163-238. ``kernel_sizes`` with more than
    one entry switches the stages to ParallelADaMoSBlock."""

    input_channels: int = 128
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (128, 256, 384, 512)
    layer_scale_init_value: float = 1e-6
    kernel_size: int = 7
    kernel_sizes: Sequence[int] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i == 0:
                # stem: conv7 (replicate pad) + LN
                x = jnp.pad(x, ((0, 0), (3, 3), (0, 0)), mode="edge")
                x = nn.Conv(
                    dim,
                    kernel_size=(7,),
                    padding="VALID",
                    dtype=self.dtype,
                    name="stem_conv",
                )(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=self.dtype, name=f"mid_norm_{i}"
                )(x)
                x = nn.Dense(dim, dtype=self.dtype, name=f"mid_proj_{i}")(x)

            for j in range(depth):
                if len(self.kernel_sizes) > 1:
                    x = ParallelADaMoSBlock(
                        dim,
                        tuple(self.kernel_sizes),
                        self.layer_scale_init_value,
                        dtype=self.dtype,
                        name=f"stage_{i}_block_{j}",
                    )(x)
                else:
                    x = ADaMoSConvNeXtBlock(
                        dim,
                        self.layer_scale_init_value,
                        kernel_size=self.kernel_size,
                        dtype=self.dtype,
                        name=f"stage_{i}_block_{j}",
                    )(x)

        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="final_norm")(x)


class HiFiGANHead(nn.Module):
    """SiLU HiFiGAN head without source template
    (reference adamos/hifigan.py:115-236)."""

    hop_length: int = 512
    upsample_rates: Sequence[int] = (4, 4, 2, 2, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (8, 8, 4, 4, 4, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11, 13)
    resblock_dilation_sizes: Sequence = ((1, 3, 5),) * 4
    num_mels: int = 512
    upsample_initial_channel: int = 1024
    pre_conv_kernel_size: int = 13
    post_conv_kernel_size: int = 13
    dtype: Dtype = jnp.float32
    # space-to-depth compute for the C<128 tail (ops/blocked_conv.py):
    # identical math + identical param tree, measured 1.45-3.25x per fan
    blocked_tail: bool = True

    @nn.compact
    def __call__(self, x):
        assert int(np.prod(self.upsample_rates)) == self.hop_length
        from ...ops.blocked_conv import (
            ConvParams,
            blocked_apply,
            conv_triples,
            convtranspose_triples,
        )

        pad = _get_padding(self.pre_conv_kernel_size)
        x = nn.Conv(
            self.upsample_initial_channel,
            kernel_size=(self.pre_conv_kernel_size,),
            padding=[(pad, pad)],
            dtype=self.dtype,
            name="conv_pre",
        )(x)

        B = x.shape[0]
        t_cur = x.shape[1]
        num_kernels = len(self.resblock_kernel_sizes)
        s = 1
        ch = self.upsample_initial_channel
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            ch_in, ch = ch, self.upsample_initial_channel // (2 ** (i + 1))
            chain = self.blocked_tail and ch < 128 and s * u * ch == 128
            if s > 1 and not chain:
                x = x.reshape(B, t_cur, ch_in)
                s = 1

            x = nn.silu(x)
            p = (k - u) // 2
            if chain:
                # polyphase blocked transposed conv (same params as the
                # plain nn.ConvTranspose(transpose_kernel=True) path)
                kernel, bias = ConvParams(
                    kernel_shape=(k, ch, ch_in), features=ch, name=f"ups_{i}"
                )()
                x = blocked_apply(
                    x, jnp.transpose(kernel, (0, 2, 1)), bias,
                    convtranspose_triples(k, u, p, s), s, s * u, self.dtype,
                )
                s = s * u
            else:
                x = nn.ConvTranspose(
                    ch,
                    kernel_size=(k,),
                    strides=(u,),
                    padding=[(k - 1 - p, k - 1 - p)],
                    transpose_kernel=True,
                    dtype=self.dtype,
                    name=f"ups_{i}",
                )(x)
            t_cur *= u

            # non-chained configs can still run the fan blocked per level
            s_fan = s
            if (
                s == 1
                and self.blocked_tail
                and ch < 128
                and t_cur % (128 // ch) == 0
            ):
                s_fan = 128 // ch
                x = x.reshape(B, t_cur // s_fan, s_fan * ch)

            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                blk = ResBlock1(
                    ch, rk, tuple(rd), activation="silu", dtype=self.dtype,
                    name=f"resblocks_{i * num_kernels + j}",
                    **({"blocked_s": s_fan} if s_fan > 1 else {}),
                )(x)
                xs = blk if xs is None else xs + blk
            x = xs / num_kernels

            if s_fan > 1 and s == 1:
                x = x.reshape(B, t_cur, ch)

        x = nn.silu(x)
        pad = _get_padding(self.post_conv_kernel_size)
        if s > 1:
            kernel, bias = ConvParams(
                kernel_shape=(self.post_conv_kernel_size, ch, 1),
                features=1,
                name="conv_post",
            )()
            x = blocked_apply(
                x, kernel, bias,
                conv_triples(self.post_conv_kernel_size, 1, s), s, s,
                self.dtype,
            )
            return jnp.tanh(x).reshape(B, t_cur)
        x = nn.Conv(
            1,
            kernel_size=(self.post_conv_kernel_size,),
            padding=[(pad, pad)],
            dtype=self.dtype,
            name="conv_post",
        )(x)
        return jnp.tanh(x)[:, :, 0]


class ADaMoSGenerator(nn.Module):
    """Backbone + head (reference adamos/adamos.py:24-42 topology)."""

    mel_channels: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        """mel [B, T, 128] -> wav [B, T*512]."""
        h = ConvNeXtEncoder(
            input_channels=self.mel_channels,
            depths=(3, 3, 9, 3),
            dims=(128, 256, 384, 512),
            dtype=self.dtype,
            name="backbone",
        )(mel.astype(self.dtype))
        return HiFiGANHead(dtype=self.dtype, name="head")(h).astype(jnp.float32)


@VOCODERS.register_module(name="ADaMoSHiFiGANV1")
class ADaMoSHiFiGANV1:
    """Inference wrapper (reference adamos/adamos.py:15-108)."""

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        use_natural_log: bool = True,
        sampling_rate: int = 44100,
        mel_channels: int = 128,
        hop_length: int = 512,
        random_init: bool = False,
    ):
        self.use_natural_log = use_natural_log
        self.sampling_rate = sampling_rate
        self.hop_length = hop_length
        self.generator = ADaMoSGenerator(mel_channels=mel_channels)
        self.mel_transform = LogMelSpectrogram(
            sample_rate=sampling_rate,
            n_mels=mel_channels,
            hop_length=hop_length,
            use_natural_log=use_natural_log,
        )

        self.params = None
        if checkpoint_path:
            import pickle

            with open(checkpoint_path, "rb") as f:
                self.params = pickle.load(f)

        self._spec2wav = jax.jit(
            lambda p, mel: self.generator.apply({"params": p}, mel)
        )

        if random_init and self.params is None:
            self.init_random(jax.random.PRNGKey(0))

    def init_random(self, rng, n_frames: int = 16):
        # jitted: eager flax init runs op-by-op over the device tunnel
        mel = jnp.zeros((1, n_frames, self.generator.mel_channels))
        self.params = jax.jit(self.generator.init)(rng, mel)["params"]
        return self.params

    def spec2wav(self, mel, f0=None, key_shift: float = 0):
        """mel [T, M] or [B, T, M]; f0 unused (no-pitch vocoder)."""
        assert self.params is not None, "no vocoder weights loaded"
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        if not self.use_natural_log:
            mel = 2.30259 * mel  # log10 -> ln (reference adamos.py:76)
        wav = self._spec2wav(self.params, mel)
        return wav[0] if squeeze else wav

    def wav2spec(self, audio, key_shift: float = 0, speed: float = 1.0):
        mel = self.mel_transform.wav2spec(audio, key_shift=key_shift, speed=speed)
        return jnp.swapaxes(mel, 1, 2)
