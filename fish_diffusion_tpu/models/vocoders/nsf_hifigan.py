"""NSF-HiFiGAN vocoder (source-filter GAN), TPU-native.

Capability parity with the reference
``fish_diffusion/modules/vocoders/nsf_hifigan/models.py``:
- ``SineGen`` (161-294): harmonic sine bank with cumulative phase + UV noise
- ``SourceModuleHnNSF`` (297-350): tanh(linear) harmonic merge
- ``Generator`` (353-448): mel conv-pre -> N x [ConvTranspose upsample +
  f0-source conv add + resblock fan] -> tanh
and the wrapper ``nsf_hifigan.py:17-106`` (spec2wav / wav2spec, natural-log
vs log10 mel convention).

TPU-first details:
- channels-last [B, T, C]; convs lower to MXU GEMMs
- phase accumulation uses ``jax.lax.associative_scan`` with modular addition
  ``(a + b) mod 1`` — associative, so the scan is log-depth AND every partial
  sum stays in [0, 1): exact phase for minutes-long audio where a raw float32
  cumsum (the reference's approach, models.py:224-231) loses precision
- weight-norm is folded at checkpoint-conversion time (the reference removes
  it at load, models.py:440-448), so inference graphs are plain convs
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.mel import LogMelSpectrogram
from ...registry import VOCODERS

Dtype = Any
LRELU_SLOPE = 0.1


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class Conv1d(nn.Module):
    """Channels-last 1-D conv with torch-compatible symmetric padding."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = _get_padding(self.kernel_size, self.dilation)
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            dtype=self.dtype,
        )(x)


# space-to-depth (blocked) conv machinery shared with RefineGAN — see
# ops/blocked_conv.py for the full rationale + measured wins
from ...ops.blocked_conv import (
    blocked_apply as _blocked_apply,
    conv_triples as _conv_triples,
    convtranspose_triples as _convtranspose_triples,
    strided_triples as _strided_triples,
)


class _ConvParams(nn.Module):
    """Parameter container matching ``nn.Conv``'s tree (kernel + bias)."""

    kernel_shape: Tuple[int, ...]
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class BlockedConv1d(nn.Module):
    """Space-to-depth formulation of ``Conv1d`` for small channel counts.

    Declares EXACTLY the same parameters as ``Conv1d`` (``Conv_0`` scope,
    kernel ``[k, Cin, Cout]`` + bias) so checkpoints and converters are
    path-compatible; only the compute differs. Input and output stay in
    the blocked layout ``[B, T/s, s*Cin]`` -> ``[B, T/s, s*Cout]``.
    """

    features: int
    kernel_size: int
    s: int
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xb):
        k, s = self.kernel_size, self.s
        cin = xb.shape[-1] // s
        cout = self.features

        kernel, bias = _ConvParams(
            kernel_shape=(k, cin, cout), features=cout, name="Conv_0"
        )()
        return _blocked_apply(
            xb, kernel, bias, _conv_triples(k, self.dilation, s), s, s,
            self.dtype,
        )


class ResBlock1(nn.Module):
    """HiFiGAN ResBlock1 (reference models.py:27-116): 3 x (dilated conv +
    plain conv) with pre-activations and residual adds.

    ``activation``: "leaky_relu" (NSF-HiFiGAN/iSTFTNet) or "silu"
    (ADaMoS variant, reference adamos/hifigan.py:100-106).
    """

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    activation: str = "leaky_relu"
    dtype: Dtype = jnp.float32
    blocked_s: int = 1  # >1: space-to-depth compute, input [B, T/s, s*C]

    @nn.compact
    def __call__(self, x):
        act = (
            nn.silu
            if self.activation == "silu"
            else lambda v: nn.leaky_relu(v, LRELU_SLOPE)
        )
        for i, d in enumerate(self.dilation):
            xt = act(x)
            if self.blocked_s > 1:
                xt = BlockedConv1d(
                    self.channels, self.kernel_size, s=self.blocked_s,
                    dilation=d, dtype=self.dtype, name=f"convs1_{i}",
                )(xt)
            else:
                xt = Conv1d(
                    self.channels, self.kernel_size, dilation=d,
                    dtype=self.dtype, name=f"convs1_{i}",
                )(xt)
            xt = act(xt)
            if self.blocked_s > 1:
                xt = BlockedConv1d(
                    self.channels, self.kernel_size, s=self.blocked_s,
                    dilation=1, dtype=self.dtype, name=f"convs2_{i}",
                )(xt)
            else:
                xt = Conv1d(
                    self.channels, self.kernel_size, dilation=1,
                    dtype=self.dtype, name=f"convs2_{i}",
                )(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """HiFiGAN ResBlock2 (reference models.py:119-158)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(
                self.channels, self.kernel_size, dilation=d,
                dtype=self.dtype, name=f"convs_{i}",
            )(xt)
            x = xt + x
        return x


def _mod1_phase_scan(rad: jax.Array) -> jax.Array:
    """Exact fractional phase: associative scan of (a+b) mod 1 along time.

    Equivalent to ``cumsum(rad) mod 1`` but every partial result stays in
    [0, 1), so float32 never loses phase precision on long signals.
    """
    return jax.lax.associative_scan(lambda a, b: jnp.mod(a + b, 1.0), rad, axis=1)


class SineGen(nn.Module):
    """Harmonic sine generator (reference models.py:161-294).

    f0: [B, T_samples, 1] (0 for unvoiced) ->
    (sine_waves [B, T, harmonic_num+1], uv [B, T, 1], noise)
    RNG stream: ``noise``.
    """

    samp_rate: int
    harmonic_num: int = 0
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0: jax.Array):
        dim = self.harmonic_num + 1
        b, t = f0.shape[0], f0.shape[1]

        harmonics = jnp.arange(1, dim + 1, dtype=jnp.float32)
        f0_buf = f0 * harmonics[None, None, :]  # [B, T, dim]

        rad_values = jnp.mod(f0_buf / self.samp_rate, 1.0)

        # random initial phase per (batch, harmonic); none for the fundamental
        rng_phase, rng_noise = jax.random.split(self.make_rng("noise"))
        rand_ini = jax.random.uniform(rng_phase, (b, dim))
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad_values = rad_values.at[:, 0, :].add(rand_ini)

        phase = _mod1_phase_scan(rad_values)
        sines = jnp.sin(2 * jnp.pi * phase) * self.sine_amp

        uv = (f0 > self.voiced_threshold).astype(jnp.float32)
        noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
        noise = noise_amp * jax.random.normal(rng_noise, sines.shape)

        sine_waves = sines * uv + noise
        return sine_waves, uv, noise


class SourceModuleHnNSF(nn.Module):
    """Harmonic merge: tanh(linear(sines)) (reference models.py:297-350)."""

    sampling_rate: int
    harmonic_num: int = 0
    sine_amp: float = 0.1
    add_noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, x):
        sine_wavs, uv, _ = SineGen(
            self.sampling_rate,
            self.harmonic_num,
            self.sine_amp,
            self.add_noise_std,
            self.voiced_threshold,
            name="l_sin_gen",
        )(x)
        sine_merge = jnp.tanh(
            nn.Dense(1, name="l_linear")(sine_wavs)
        )
        noise = (
            jax.random.normal(self.make_rng("noise"), uv.shape) * self.sine_amp / 3
        )
        return sine_merge, noise, uv


@VOCODERS.register_module(name="NsfHifiGANGenerator")
class NsfHifiGANGenerator(nn.Module):
    """The NSF-HiFiGAN generator network (reference models.py:353-448).

    Inputs: mel [B, T, num_mels] (channels-last), f0 [B, T].
    Output: audio [B, T * hop_size].
    """

    num_mels: int = 128
    sampling_rate: int = 44100
    hop_size: int = 512
    upsample_rates: Sequence[int] = (8, 8, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4, 4)
    upsample_initial_channel: int = 512
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    dtype: Dtype = jnp.float32
    # space-to-depth resblock compute at channel counts below the 128 MXU
    # lane width (see _blocked_tap_indices): measured 1.45x/2.41x/3.25x on
    # the C=64/32/16 levels, identical math + identical param tree
    blocked_tail: bool = True

    @nn.compact
    def __call__(self, mel: jax.Array, f0: jax.Array):
        assert mel.shape[-1] == self.num_mels
        n_frames = mel.shape[1]
        total_up = int(np.prod(self.upsample_rates))

        # harmonic source from FRAME-rate f0 in blocked layout (the
        # sample-rate interp + cumsum the reference uses are pathological
        # on TPU — see vocoders/source.py)
        from .source import BlockedSourceModule

        har_source, _, _ = BlockedSourceModule(
            sampling_rate=self.sampling_rate,
            hop=self.hop_size,
            harmonic_num=8,
            interp="nearest",  # reference f0_upsamp is nn.Upsample(nearest)
            name="m_source",
        )(f0)  # [B, T_samples, 1]

        x = nn.Conv(
            self.upsample_initial_channel,
            kernel_size=(7,),
            padding=[(3, 3)],
            dtype=self.dtype,
            name="conv_pre",
        )(mel.astype(self.dtype))

        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        num_kernels = len(self.resblock_kernel_sizes)
        B = x.shape[0]
        t5 = har_source.shape[1]

        s = 1  # current space-to-depth block factor of x
        t_cur = n_frames  # logical sample length of x (x.shape[1] * s)
        ch = self.upsample_initial_channel

        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            ch_in, ch = ch, self.upsample_initial_channel // (2 ** (i + 1))

            # can the post-upsample level live in blocked layout, chained
            # from the current one? (s*u slots of ch channels = 128 lanes)
            chain = (
                self.blocked_tail
                and self.resblock == "1"
                and ch < 128
                and s * u * ch == 128
            )
            if s > 1 and not chain:  # config broke the chain: unblock
                x = x.reshape(B, t_cur, ch_in)
                s = 1

            x = nn.leaky_relu(x, LRELU_SLOPE)
            # torch ConvTranspose1d(k, stride=u, padding=(k-u)//2):
            # out_len = T*u. Plain path: flax ConvTranspose with matching
            # edge padding (transpose_kernel=True keeps torch weight
            # layout). Chained path: polyphase blocked form of the SAME
            # parameters — output lands directly in the next level's
            # [B, T/(s*u), s*u*ch] layout, no thin [T, ch] intermediate.
            pad = (k - u) // 2
            if chain:
                kernel, bias = _ConvParams(
                    kernel_shape=(k, ch, ch_in), features=ch, name=f"ups_{i}"
                )()
                taps = jnp.transpose(kernel, (0, 2, 1))  # [k, Cin, Cout]
                x = _blocked_apply(
                    x, taps, bias,
                    _convtranspose_triples(k, u, pad, s), s, s * u,
                    self.dtype,
                )
            else:
                x = nn.ConvTranspose(
                    ch,
                    kernel_size=(k,),
                    strides=(u,),
                    padding=[(k - 1 - pad, k - 1 - pad)],
                    transpose_kernel=True,
                    dtype=self.dtype,
                    name=f"ups_{i}",
                )(x)
            t_cur *= u
            s_lvl = s * u if chain else 1

            # harmonic source injection at this scale
            if i + 1 < len(self.upsample_rates):
                stride_f0 = int(np.prod(self.upsample_rates[i + 1 :]))
                k_nc, st_nc, p_nc = stride_f0 * 2, stride_f0, stride_f0 // 2
            else:
                k_nc, st_nc, p_nc = 1, 1, 0
            ib = st_nc * max(s_lvl, 1)  # source samples per output block
            if self.blocked_tail and t5 % ib == 0 and (s_lvl > 1 or ib > 1):
                # blocked-input strided conv: the [T5, 1] source is
                # MXU/layout-hostile; reshape to [T5/ib, ib] and scatter
                # the [k, 1, ch] kernel into [Kb, ib, s_lvl*ch]
                kernel, bias = _ConvParams(
                    kernel_shape=(k_nc, 1, ch), features=ch,
                    name=f"noise_convs_{i}",
                )()
                src_b = har_source.reshape(B, t5 // ib, ib)
                x_source = _blocked_apply(
                    src_b, kernel, bias,
                    _strided_triples(k_nc, st_nc, p_nc, max(s_lvl, 1)),
                    ib, max(s_lvl, 1), self.dtype,
                )
                if s_lvl == 1:  # plain-layout level: [T_i/1... ] -> [T_i, ch]
                    x_source = x_source.reshape(B, t_cur, ch)
            else:
                x_source = nn.Conv(
                    ch,
                    kernel_size=(k_nc,),
                    strides=(st_nc,),
                    padding=[(p_nc, p_nc)],
                    dtype=self.dtype,
                    name=f"noise_convs_{i}",
                )(har_source.astype(self.dtype))
                if s_lvl > 1:
                    x_source = x_source.reshape(B, t_cur // s_lvl, s_lvl * ch)

            x = x + x_source
            s = s_lvl

            # non-chained configs can still run the fan blocked per level
            s_fan = s
            t_full = t_cur
            if (
                s == 1
                and self.blocked_tail
                and self.resblock == "1"
                and ch < 128
                and x.shape[1] % (128 // ch) == 0
            ):
                s_fan = 128 // ch
                x = x.reshape(B, t_full // s_fan, s_fan * ch)

            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                block = res_cls(
                    ch,
                    rk,
                    tuple(rd),
                    dtype=self.dtype,
                    name=f"resblocks_{i * num_kernels + j}",
                    **({"blocked_s": s_fan} if s_fan > 1 else {}),
                )(x)
                xs = block if xs is None else xs + block
            x = xs / num_kernels

            if s_fan > 1 and s == 1:
                x = x.reshape(B, t_full, ch)

        x = nn.leaky_relu(x, 0.01)  # torch default slope (models.py:434)
        if s > 1:
            # conv_post in blocked layout: [B, T/s, s*ch] -> [B, T/s, s]
            kernel, bias = _ConvParams(
                kernel_shape=(7, ch, 1), features=1, name="conv_post"
            )()
            x = _blocked_apply(
                x, kernel, bias, _conv_triples(7, 1, s), s, s, self.dtype
            )
            x = jnp.tanh(x).reshape(B, t_cur)
            return x.astype(jnp.float32)

        x = nn.Conv(
            1, kernel_size=(7,), padding=[(3, 3)], dtype=self.dtype,
            name="conv_post",
        )(x)
        x = jnp.tanh(x)

        return x[:, :, 0].astype(jnp.float32)


@VOCODERS.register_module(name="NsfHifiGAN")
class NsfHifiGAN:
    """Inference wrapper with spec2wav / wav2spec
    (reference ``nsf_hifigan.py:17-106``).

    Holds converted generator params (see
    ``tools/convert_nsf_hifigan_checkpoint.py``) and the mel transform with
    the matching log convention.
    """

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        sampling_rate: int = 44100,
        mel_channels: int = 128,
        n_fft: int = 2048,
        win_length: int = 2048,
        hop_length: int = 512,
        f_min: float = 40.0,
        f_max: float = 16000.0,
        use_natural_log: bool = True,
        generator_config: Optional[dict] = None,
        random_init: bool = False,
    ):
        self.use_natural_log = use_natural_log
        self.mel_transform = LogMelSpectrogram(
            sample_rate=sampling_rate,
            n_fft=n_fft,
            win_length=win_length,
            hop_length=hop_length,
            f_min=f_min,
            f_max=f_max,
            n_mels=mel_channels,
            use_natural_log=use_natural_log,
        )

        gen_cfg = dict(
            num_mels=mel_channels,
            sampling_rate=sampling_rate,
            hop_size=hop_length,
        )
        if generator_config:
            gen_cfg.update(generator_config)
        self.generator = NsfHifiGANGenerator(**gen_cfg)

        # strict config-kwarg validation (reference nsf_hifigan.py:99-106:
        # mismatched knobs fail loudly instead of silently desyncing the mel
        # transform from the checkpoint)
        assert int(np.prod(self.generator.upsample_rates)) == hop_length, (
            f"upsample_rates {self.generator.upsample_rates} do not multiply "
            f"to hop_length {hop_length}"
        )

        self.params = None
        if checkpoint_path is not None:
            self.load_checkpoint(checkpoint_path)

        self._spec2wav = jax.jit(self._spec2wav_impl)

        if random_init and self.params is None:
            self.init_random(jax.random.PRNGKey(0))

    def load_checkpoint(self, path: str):
        """Load params converted by tools/convert_nsf_hifigan_checkpoint.py."""
        import pickle

        with open(path, "rb") as f:
            self.params = pickle.load(f)

    def init_random(self, rng: jax.Array, n_frames: int = 32):
        """Random init (for tests / training-from-scratch).

        The init MUST be jitted: eager flax init executes op-by-op over the
        device tunnel (~260 s for this generator vs ~3 s jitted).
        """
        mel = jnp.zeros((1, n_frames, self.generator.num_mels))
        f0 = jnp.full((1, n_frames), 220.0)
        variables = jax.jit(self.generator.init)(
            {"params": rng, "noise": jax.random.fold_in(rng, 1)}, mel, f0
        )
        self.params = variables["params"]
        return self.params

    def _spec2wav_impl(self, params, mel, f0, rng):
        if self.use_natural_log:
            mel_in = mel
        else:
            mel_in = 0.434294 * mel
        return self.generator.apply(
            {"params": params}, mel_in, f0, rngs={"noise": rng}
        )

    def spec2wav(self, mel: jax.Array, f0: jax.Array, rng: Optional[jax.Array] = None):
        """mel [B, T, M] or [T, M], f0 [B, T] or [T] -> audio."""
        assert self.params is not None, "vocoder has no parameters loaded"
        if rng is None:
            rng = jax.random.PRNGKey(0)
        squeeze = mel.ndim == 2
        if squeeze:
            mel, f0 = mel[None], f0[None]
        wav = self._spec2wav(self.params, mel, f0, rng)
        return wav[0] if squeeze else wav

    def wav2spec(self, audio: jax.Array, key_shift: float = 0.0, speed: float = 1.0):
        """audio [B, T] -> log-mel [B, T_frames, M] (channels-last)."""
        mel = self.mel_transform.wav2spec(audio, key_shift=key_shift, speed=speed)
        return jnp.swapaxes(mel, 1, 2)
