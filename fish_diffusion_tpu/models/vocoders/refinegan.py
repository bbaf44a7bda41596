"""RefineGAN: UNet-style pitch-conditioned waveform generator, TPU-native.

Capability parity with the reference
``fish_diffusion/modules/vocoders/refinegan/generator.py``:
- ``ResBlock`` (:14-86): channel-changing dilated conv stack
- ``AdaIN`` (:89-104): learned-scale gaussian noise + leaky-relu
- ``ParallelResBlock`` (:107-156): 3 kernel sizes, AdaIN sandwich, mean-fused
- ``CombToothGen`` (:159-194): sinc comb excitation with exact phase
- ``SineGen`` (:197-310): harmonic sine bank + learned tanh merge
- ``RefineGANGenerator`` (:313-478): template conv -> 4 downsample blocks ->
  mel concat -> 4x [linear upsample + source add + skip concat +
  ParallelResBlock] -> tanh

TPU-first: channels-last [B, T, C]; phase accumulation via the mod-1
associative scan (exact for minutes of audio); linear up/downsampling with
half-pixel sampling (torch Upsample align_corners=False semantics); weight
norm via flax ``nn.WeightNorm`` (stateless, folds at export).

RNG streams: ``noise`` (template noise + AdaIN noise).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.tensor import repeat_expand
from ...registry import VOCODERS
from .nsf_hifigan import _get_padding, _mod1_phase_scan

Dtype = Any


# space-to-depth (blocked) conv machinery shared with NSF-HiFiGAN — see
# ops/blocked_conv.py for the rationale + measured wins
from ...ops.blocked_conv import (
    ConvParams,
    WNScale,
    blocked_apply,
    conv_triples,
    strided_triples,
    weight_norm_kernel,
)


def _blocked_wn_conv(
    xb, name, cin, features, kernel_size, dilation, triples, s_in, s_out, dtype
):
    """Blocked weight-norm conv declaring the same params as
    ``nn.WeightNorm(nn.Conv(name=f"{name}_conv"), name=name)`` (must be
    called inside the parent module's compact scope)."""
    scale = WNScale(conv_name=f"{name}_conv", features=features, name=name)()
    kernel, bias = ConvParams(
        kernel_shape=(kernel_size, cin, features),
        features=features,
        kernel_init=nn.initializers.normal(0.01),
        name=f"{name}_conv",
    )()
    w = weight_norm_kernel(kernel, scale)
    return blocked_apply(xb, w, bias, triples, s_in, s_out, dtype)


def _wn_conv(features, kernel_size, name, dtype=jnp.float32, stride=1, dilation=1,
             kernel_init=None):
    conv = nn.Conv(
        features,
        kernel_size=(kernel_size,),
        strides=(stride,),
        kernel_dilation=(dilation,),
        padding=[(_get_padding(kernel_size, dilation),) * 2],
        dtype=dtype,
        kernel_init=kernel_init or nn.initializers.normal(0.01),
        name=f"{name}_conv",
    )
    return nn.WeightNorm(conv, name=name)


def linear_resize(x: jax.Array, new_len: int) -> jax.Array:
    """[B, T, C] -> [B, new_len, C], torch linear align_corners=False."""
    xt = jnp.swapaxes(x, 1, 2)  # [B, C, T]
    out = repeat_expand(xt, new_len, mode="linear")
    return jnp.swapaxes(out, 1, 2)


class ResBlock(nn.Module):
    """reference refinegan/generator.py:14-86."""

    in_channels: int
    out_channels: int
    kernel_size: int = 7
    dilation: Tuple[int, ...] = (1, 3, 5)
    leaky_relu_slope: float = 0.2
    dtype: Dtype = jnp.float32
    blocked_s: int = 1  # >1: space-to-depth compute (ops/blocked_conv.py)
    blocked_io: bool = True  # reshape plain->blocked at entry/exit

    @nn.compact
    def __call__(self, x):
        s = self.blocked_s
        if s > 1 and self.blocked_io:
            b, t, c = x.shape
            x = x.reshape(b, t // s, s * c)

        for idx, d in enumerate(self.dilation):
            cin = self.in_channels if idx == 0 else self.out_channels
            xt = nn.leaky_relu(x, self.leaky_relu_slope)
            if s > 1:
                xt = _blocked_wn_conv(
                    xt, f"convs1_{idx}", cin, self.out_channels,
                    self.kernel_size, d,
                    conv_triples(self.kernel_size, d, s), s, s, self.dtype,
                )
            else:
                xt = _wn_conv(
                    self.out_channels, self.kernel_size, f"convs1_{idx}",
                    self.dtype, dilation=d,
                )(xt)
            xt = nn.leaky_relu(xt, self.leaky_relu_slope)
            if s > 1:
                xt = _blocked_wn_conv(
                    xt, f"convs2_{idx}", self.out_channels, self.out_channels,
                    self.kernel_size, d,
                    conv_triples(self.kernel_size, d, s), s, s, self.dtype,
                )
            else:
                xt = _wn_conv(
                    self.out_channels, self.kernel_size, f"convs2_{idx}",
                    self.dtype, dilation=d,
                )(xt)

            if idx != 0 or self.in_channels == self.out_channels:
                x = xt + x
            else:
                x = xt

        if s > 1 and self.blocked_io:
            b, nb, _ = x.shape
            x = x.reshape(b, nb * s, self.out_channels)
        return x


class AdaIN(nn.Module):
    """Learned-amplitude noise injection (reference :89-104)."""

    channels: int
    leaky_relu_slope: float = 0.2
    tile_s: int = 1  # blocked layout: weight tiled over the s slots

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.channels,))
        if self.tile_s > 1:
            weight = jnp.tile(weight, self.tile_s)
        # NOTE: in blocked layout the noise draw is the row-major reshape of
        # the plain draw (same flat element order), so blocked == plain
        # bit-for-bit given the same rng key
        noise = jax.random.normal(self.make_rng("noise"), x.shape, x.dtype)
        return nn.leaky_relu(
            x + noise * weight[None, None, :].astype(x.dtype),
            self.leaky_relu_slope,
        )


class ParallelResBlock(nn.Module):
    """reference :107-156."""

    in_channels: int
    out_channels: int
    kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    dilation: Tuple[int, ...] = (1, 3, 5)
    leaky_relu_slope: float = 0.2
    dtype: Dtype = jnp.float32
    blocked_s: int = 1  # >1: space-to-depth compute (ops/blocked_conv.py)
    blocked_out: bool = False  # leave output in blocked layout

    @nn.compact
    def __call__(self, x):
        s = self.blocked_s
        if s > 1:
            b, t, cin = x.shape
            xb = x.reshape(b, t // s, s * cin)
            kernel, bias = ConvParams(
                kernel_shape=(7, cin, self.out_channels),
                features=self.out_channels,
                name="input_conv",
            )()
            x = blocked_apply(
                xb, kernel, bias, conv_triples(7, 1, s), s, s, self.dtype
            )
        else:
            x = nn.Conv(
                self.out_channels,
                kernel_size=(7,),
                padding=[(3, 3)],
                dtype=self.dtype,
                name="input_conv",
            )(x)

        results = []
        for k in self.kernel_sizes:
            y = AdaIN(self.out_channels, self.leaky_relu_slope,
                      tile_s=s, name=f"adain1_k{k}")(x)
            y = ResBlock(
                self.out_channels,
                self.out_channels,
                k,
                self.dilation,
                self.leaky_relu_slope,
                self.dtype,
                blocked_s=s,
                blocked_io=False,
                name=f"res_k{k}",
            )(y)
            y = AdaIN(self.out_channels, self.leaky_relu_slope,
                      tile_s=s, name=f"adain2_k{k}")(y)
            results.append(y)

        out = sum(results) / len(results)
        if s > 1 and not self.blocked_out:
            b, nb, _ = out.shape
            out = out.reshape(b, nb * s, self.out_channels)
        return out


class CombToothGen(nn.Module):
    """Sinc comb excitation (reference :159-194): exact fractional phase via
    the mod-1 associative scan, centered to [-0.5, 0.5] like cumsum-round."""

    sampling_rate: int = 44100
    wave_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0: jax.Array) -> jax.Array:
        """f0 [B, T, 1] -> combtooth [B, T, 1]."""
        rad = f0 / self.sampling_rate
        phase = _mod1_phase_scan(rad)
        x = phase - jnp.round(phase)  # [-0.5, 0.5]
        combtooth = jnp.sinc(self.sampling_rate * x / (f0 + 1e-3)) * self.wave_amp

        uv = (f0 > self.voiced_threshold).astype(jnp.float32)
        noise_amp = uv * self.noise_std + (1 - uv) * self.wave_amp / 3
        noise = noise_amp * jax.random.normal(self.make_rng("noise"), combtooth.shape)
        return combtooth * uv + noise


class RefineSineGen(nn.Module):
    """Harmonic sine bank + learned tanh merge (reference :197-310)."""

    sampling_rate: int = 44100
    harmonic_num: int = 0
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0: jax.Array) -> jax.Array:
        """f0 [B, T, 1] -> merged sine [B, T, 1]."""
        dim = self.harmonic_num + 1
        b = f0.shape[0]

        harmonics = jnp.arange(1, dim + 1, dtype=jnp.float32)
        f0_buf = f0 * harmonics[None, None, :]

        rad = jnp.mod(f0_buf / self.sampling_rate, 1.0)
        rng_phase, rng_noise = jax.random.split(self.make_rng("noise"))
        rand_ini = jax.random.uniform(rng_phase, (b, dim)).at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)

        sines = jnp.sin(2 * jnp.pi * _mod1_phase_scan(rad))
        sines = jnp.where(f0_buf > self.sampling_rate // 2, 0.0, sines)
        sines = sines * self.sine_amp

        uv = (f0 > self.voiced_threshold).astype(jnp.float32)
        noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
        noise = noise_amp * jax.random.normal(rng_noise, sines.shape)
        sines = jax.lax.stop_gradient(sines * uv + noise)

        merged = nn.Dense(1, name="merge")(sines)
        return jnp.tanh(merged)


@VOCODERS.register_module(name="RefineGANGenerator")
class RefineGANGenerator(nn.Module):
    """reference :313-478. mel [B, T, num_mels], f0 [B, T] ->
    wav [B, T * hop_length]."""

    sampling_rate: int = 44100
    hop_length: int = 256
    downsample_rates: Sequence[int] = (2, 2, 8, 8)
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    leaky_relu_slope: float = 0.2
    num_mels: int = 128
    start_channels: int = 16
    template_generator: str = "comb"
    template_noise_std: float = 0.003  # reference CombToothGen/SineGen default
    dtype: Dtype = jnp.float32
    # space-to-depth compute for the MXU-starved small-channel stages
    # (ops/blocked_conv.py): identical math + identical param tree
    blocked_tail: bool = True

    @nn.compact
    def __call__(self, mel: jax.Array, f0: jax.Array) -> jax.Array:
        assert (
            int(np.prod(self.downsample_rates))
            == int(np.prod(self.upsample_rates))
            == self.hop_length
        )
        n_frames = mel.shape[1]
        t_samples = n_frames * self.hop_length

        if f0.ndim == 3:
            f0 = f0[:, :, 0]

        from .source import BlockedCombTooth

        if self.template_generator == "comb":
            template = BlockedCombTooth(
                sampling_rate=self.sampling_rate,
                hop=self.hop_length,
                noise_std=self.template_noise_std,
                name="template_gen",
            )(f0)
        else:
            f0_s = linear_resize(f0[:, :, None], t_samples)
            template = RefineSineGen(
                sampling_rate=self.sampling_rate,
                noise_std=self.template_noise_std,
                name="template_gen",
            )(f0_s)
        template = template.astype(self.dtype)

        def _bs(ch, t):
            """Block factor for a stage at channel count ch, length t."""
            if not self.blocked_tail or ch >= 128:
                return 1
            s = 128 // ch
            return s if t % s == 0 else 1

        s_tc = _bs(self.start_channels, t_samples)
        if s_tc > 1:
            # template_conv from the [T, 1] source in blocked-input form
            # (a 1-channel input is as MXU/layout-hostile as 16 channels)
            x = _blocked_wn_conv(
                template.reshape(template.shape[0], t_samples // s_tc, s_tc),
                "template_conv", 1, self.start_channels, 7, 1,
                conv_triples(7, 1, s_tc), s_tc, s_tc, self.dtype,
            ).reshape(template.shape[0], t_samples, self.start_channels)
        else:
            x = _wn_conv(self.start_channels, 7, "template_conv", self.dtype)(
                template
            )

        channels = self.start_channels
        downs = []
        for i, rate in enumerate(self.downsample_rates):
            x = nn.leaky_relu(x, self.leaky_relu_slope)
            downs.append(x)
            x = linear_resize(x, x.shape[1] // rate)
            channels *= 2
            x = ResBlock(
                channels // 2,
                channels,
                7,
                (1, 3, 5),
                self.leaky_relu_slope,
                self.dtype,
                blocked_s=_bs(channels, x.shape[1]),
                name=f"down_res_{i}",
            )(x)

        mel_feat = _wn_conv(channels, 7, "mel_conv", self.dtype)(
            mel.astype(self.dtype)
        )
        x = jnp.concatenate([x, mel_feat], axis=-1)
        channels *= 2

        stride_f0 = int(np.prod(self.upsample_rates[1:]))
        for idx, rate in enumerate(self.upsample_rates):
            x = nn.leaky_relu(x, self.leaky_relu_slope)
            x = linear_resize(x, x.shape[1] * rate)

            if idx == 0:
                t_src = template.shape[1]
                if self.blocked_tail and t_src % stride_f0 == 0:
                    # strided source conv with the [T, 1] template read as
                    # [T/stride, stride] blocks
                    kernel, bias = ConvParams(
                        kernel_shape=(stride_f0 * 2, 1, channels),
                        features=channels,
                        name="source_conv",
                    )()
                    source = blocked_apply(
                        template.reshape(
                            template.shape[0], t_src // stride_f0, stride_f0
                        ),
                        kernel, bias,
                        strided_triples(
                            stride_f0 * 2, stride_f0, stride_f0 // 2, 1
                        ),
                        stride_f0, 1, self.dtype,
                    )
                else:
                    source = nn.Conv(
                        channels,
                        kernel_size=(stride_f0 * 2,),
                        strides=(stride_f0,),
                        padding=[(stride_f0 // 2, stride_f0 // 2)],
                        dtype=self.dtype,
                        name="source_conv",
                    )(template)
                x = x + source[:, : x.shape[1]]

            down = downs[len(downs) - 1 - idx]
            x = jnp.concatenate([x, down[:, : x.shape[1]]], axis=-1)

            new_channels = channels // 2
            last = idx == len(self.upsample_rates) - 1
            s_up = _bs(new_channels, x.shape[1])
            x = ParallelResBlock(
                channels + channels // 4,
                new_channels,
                (3, 7, 11),
                (1, 3, 5),
                self.leaky_relu_slope,
                self.dtype,
                blocked_s=s_up,
                blocked_out=last and s_up > 1,
                name=f"up_res_{idx}",
            )(x)
            channels = new_channels

        x = nn.leaky_relu(x, self.leaky_relu_slope)
        if s_up > 1:
            # x is still blocked [B, T/s, s*C]: run output_conv blocked and
            # unblock only the final 1-channel waveform
            x = _blocked_wn_conv(
                x, "output_conv", channels, 1, 7, 1,
                conv_triples(7, 1, s_up), s_up, s_up, self.dtype,
            )
            x = jnp.tanh(x).reshape(x.shape[0], t_samples)
            return x.astype(jnp.float32)

        x = _wn_conv(1, 7, "output_conv", self.dtype)(x)
        x = jnp.tanh(x)

        return x[:, :, 0].astype(jnp.float32)
