"""iSTFTNet: HiFiGAN variant predicting STFT magnitude+phase, final iSTFT.

Capability parity with the reference
``fish_diffusion/modules/vocoders/istft_net/``:
- ``Generator`` (models.py:11-51): NSF-HiFiGAN trunk (fewer upsamples),
  reflection-pad + conv-post emitting ``gen_istft_n_fft + 2`` channels,
  ``spec = exp(first half)``, ``phase = sin(second half)``
- wrapper ``ISTFTNet`` (istft_net.py:18-117) with torch.istft equivalent
  (ops.mel.istft) and ln/log10 convention
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.mel import LogMelSpectrogram, istft
from ...registry import VOCODERS
from .nsf_hifigan import ResBlock1

Dtype = Any


class ISTFTNetGenerator(nn.Module):
    """mel [B, T, M], f0 [B, T] -> (spec, phase) each [B, bins, frames]."""

    num_mels: int = 128
    sampling_rate: int = 44100
    hop_size: int = 512  # total mel hop; upsample_rates cover hop/istft_hop
    upsample_rates: Sequence[int] = (8, 8)
    upsample_kernel_sizes: Sequence[int] = (16, 16)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence = ((1, 3, 5),) * 3
    gen_istft_n_fft: int = 16
    gen_istft_hop_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, f0):
        n_frames = mel.shape[1]
        total_up = int(np.prod(self.upsample_rates))

        # harmonic source at TRUNK rate (prod(upsample_rates) per frame) —
        # the reference's parent f0_upsamp scales by prod(upsample_rates),
        # not to the audio sample rate (models.py:359 with the iSTFT trunk)
        from .source import BlockedSourceModule

        har_source, _, _ = BlockedSourceModule(
            sampling_rate=self.sampling_rate,
            hop=total_up,
            harmonic_num=8,
            interp="nearest",  # reference f0_upsamp is nn.Upsample(nearest)
            name="m_source",
        )(f0)
        har = har_source.astype(self.dtype)

        x = nn.Conv(
            self.upsample_initial_channel,
            kernel_size=(7,),
            padding=[(3, 3)],
            dtype=self.dtype,
            name="conv_pre",
        )(mel.astype(self.dtype))

        num_kernels = len(self.resblock_kernel_sizes)
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, 0.1)
            p = (k - u) // 2
            x = nn.ConvTranspose(
                ch,
                kernel_size=(k,),
                strides=(u,),
                padding=[(k - 1 - p, k - 1 - p)],
                transpose_kernel=True,
                dtype=self.dtype,
                name=f"ups_{i}",
            )(x)

            if i + 1 < len(self.upsample_rates):
                stride_f0 = int(np.prod(self.upsample_rates[i + 1 :]))
                xs_src = nn.Conv(
                    ch,
                    kernel_size=(stride_f0 * 2,),
                    strides=(stride_f0,),
                    padding=[(stride_f0 // 2, stride_f0 // 2)],
                    dtype=self.dtype,
                    name=f"noise_convs_{i}",
                )(har)
            else:
                xs_src = nn.Conv(
                    ch, kernel_size=(1,), dtype=self.dtype, name=f"noise_convs_{i}"
                )(har)
            x = x + xs_src[:, : x.shape[1]]

            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                blk = ResBlock1(
                    ch, rk, tuple(rd), dtype=self.dtype,
                    name=f"resblocks_{i * num_kernels + j}",
                )(x)
                xs = blk if xs is None else xs + blk
            x = xs / num_kernels

        x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)), mode="reflect")
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(
            self.gen_istft_n_fft + 2,
            kernel_size=(7,),
            padding=[(3, 3)],
            dtype=self.dtype,
            name="conv_post",
        )(x)

        bins = self.gen_istft_n_fft // 2 + 1
        spec = jnp.exp(x[:, :, :bins].astype(jnp.float32))
        phase = jnp.sin(x[:, :, bins:].astype(jnp.float32))
        return jnp.swapaxes(spec, 1, 2), jnp.swapaxes(phase, 1, 2)


@VOCODERS.register_module(name="ISTFTNet")
class ISTFTNet:
    """Inference wrapper (reference istft_net.py:18-117)."""

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        use_natural_log: bool = True,
        sampling_rate: int = 44100,
        mel_channels: int = 128,
        hop_length: int = 512,
        gen_istft_n_fft: int = 16,
        gen_istft_hop_size: int = 8,
        upsample_rates: Sequence[int] = (8, 8),
        upsample_kernel_sizes: Sequence[int] = (16, 16),
        random_init: bool = False,
        **kwargs,
    ):
        self.use_natural_log = use_natural_log
        self.sampling_rate = sampling_rate
        self.hop_length = hop_length
        self.gen_istft_n_fft = gen_istft_n_fft
        self.gen_istft_hop_size = gen_istft_hop_size

        self.generator = ISTFTNetGenerator(
            num_mels=mel_channels,
            sampling_rate=sampling_rate,
            hop_size=hop_length,
            upsample_rates=tuple(upsample_rates),
            upsample_kernel_sizes=tuple(upsample_kernel_sizes),
            gen_istft_n_fft=gen_istft_n_fft,
            gen_istft_hop_size=gen_istft_hop_size,
        )
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

        def _forward(params, mel, f0, rng):
            spec, phase = self.generator.apply(
                {"params": params}, mel, f0, rngs={"noise": rng}
            )
            real = spec * jnp.cos(phase)
            imag = spec * jnp.sin(phase)
            return istft(
                real, imag, self.gen_istft_n_fft, self.gen_istft_hop_size
            )

        self._spec2wav = jax.jit(_forward)

        if random_init and self.params is None:
            self.init_random(jax.random.PRNGKey(0))

    def init_random(self, rng, n_frames: int = 16):
        # jitted: eager flax init runs op-by-op over the device tunnel
        mel = jnp.zeros((1, n_frames, self.generator.num_mels))
        f0 = jnp.full((1, n_frames), 220.0)
        variables = jax.jit(self.generator.init)(
            {"params": rng, "noise": jax.random.fold_in(rng, 1)}, mel, f0
        )
        self.params = variables["params"]
        return self.params

    def spec2wav(self, mel, f0, rng=None):
        assert self.params is not None, "no vocoder weights loaded"
        if rng is None:
            rng = jax.random.PRNGKey(0)
        squeeze = mel.ndim == 2
        if squeeze:
            mel, f0 = mel[None], f0[None]
        if not self.use_natural_log:
            mel = 2.30259 * mel
        wav = self._spec2wav(self.params, mel, f0, rng)
        return wav[0] if squeeze else wav

    def wav2spec(self, audio, key_shift: float = 0, speed: float = 1.0):
        mel = self.mel_transform.wav2spec(audio, key_shift=key_shift, speed=speed)
        return jnp.swapaxes(mel, 1, 2)
