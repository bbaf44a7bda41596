"""GAN discriminators + losses, TPU-native.

Capability parity with the reference:
- ``MultiPeriodDiscriminator`` (nsf_hifigan/models.py:525-548 and the
  configurable-channel refinegan/mpd.py:9-91)
- ``MultiScaleDiscriminator`` (nsf_hifigan/models.py:550-613)
- ``MultiResolutionDiscriminator`` over STFT magnitudes (refinegan/mrd.py)
- loss functions: LSGAN discriminator/generator losses, feature-matching
  loss (models.py:616-649), multi-scale STFT loss, multi-scale mel loss,
  envelope loss (hifisinger_v2.py:89-115)

Notes:
- weight-norm via flax ``nn.WeightNorm``; the reference's one
  spectral-norm instance (first MSD discriminator, models.py:594) is
  genuine spectral norm here: power-iteration ``u``/``v`` vectors live in
  a ``"spectral"`` variable collection threaded through the jitted GAN
  step as explicit train-state (``training/gan.py:GANTrainState.spectral_d``)
  and updated once per discriminator forward in the D phase, exactly the
  ``torch.nn.utils.spectral_norm`` train-mode semantics
  (``tests/test_spectral_norm.py`` pins parity)
- discriminator COMPUTE dtype is configurable (``dtype`` on every class;
  params, weight/spectral-norm kernel math, and loss reductions stay f32).
  Default f32 matches the reference's "32-true" GAN precision
  (configs/svc_hifisinger_v2.py:112); bf16 halves the discriminators' HBM
  traffic — the dominant bytes of the v1 trainer step
  (docs/artifacts/vocoder_step_attribution_r05.json) — and keeps f32's
  exponent range, so the reference's fp16-era ``nan_to_num`` guards stay
  unnecessary either way
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.mel import LogMelSpectrogram, stft_magnitude

Dtype = Any


def _l2normalize(x, eps: float = 1e-12):
    """torch ``F.normalize`` semantics: x / max(||x||, eps)."""
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def spectral_norm_kernel(kernel, u, v, update: bool, eps: float = 1e-12):
    """Spectral normalization of a flax conv kernel with
    ``torch.nn.utils.spectral_norm`` semantics (one power iteration per
    train-mode forward; ``u``/``v`` are non-differentiable buffers; sigma
    = u . W v differentiates through W only).

    ``kernel``: flax layout ``[*k, cin, cout]``. The power-iteration
    matrix is the torch view ``W = weight.reshape(cout, -1)`` with torch's
    ``[cout, cin, *k]`` axis order, so ``u``/``v`` trajectories match the
    reference bit-for-bit given the same starting buffers.

    Returns ``(kernel / sigma, u_new, v_new)``; with ``update=False`` the
    stored vectors are used unchanged (torch eval mode).
    """
    nd = kernel.ndim
    cout = kernel.shape[-1]
    w = jnp.transpose(
        kernel, (nd - 1, nd - 2) + tuple(range(nd - 2))
    ).reshape(cout, -1)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    if update:
        w_sg = jax.lax.stop_gradient(w)
        v = _l2normalize(w_sg.T @ u, eps)
        u = _l2normalize(w_sg @ v, eps)
    sigma = jnp.dot(u, w @ v)
    return kernel / sigma, u, v


def _wn_conv2d(features, kernel, stride, padding, name, dtype=jnp.float32):
    conv = nn.Conv(
        features,
        kernel_size=kernel,
        strides=stride,
        padding=padding,
        kernel_init=nn.initializers.normal(0.01),
        dtype=dtype,
        name=f"{name}_conv",
    )
    return nn.WeightNorm(conv, name=name)


class DiscriminatorP(nn.Module):
    """Period discriminator (reference refinegan/mpd.py:9-66): fold the
    waveform into [T/p, p] and run strided 2-D convs."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channels: Optional[Sequence[int]] = None
    leaky_relu_slope: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, T] -> (score [B, N], fmap list)."""
        channels = list(self.channels or [1, 32, 128, 512, 1024, 1024])

        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1).astype(
            self.dtype
        )  # NHWC

        fmap = []
        h = x
        for i, ch in enumerate(channels[1:]):
            stride = (self.stride, 1) if i < len(channels) - 2 else (1, 1)
            h = _wn_conv2d(
                ch,
                (self.kernel_size, 1),
                stride,
                [(self.kernel_size // 2, self.kernel_size // 2), (0, 0)],
                f"convs_{i}",
                dtype=self.dtype,
            )(h)
            h = nn.leaky_relu(h, self.leaky_relu_slope)
            fmap.append(h)

        h = _wn_conv2d(
            1, (3, 1), (1, 1), [(1, 1), (0, 0)], "conv_post", dtype=self.dtype
        )(h)
        fmap.append(h)
        return h.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channels: Optional[Sequence[int]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores, fmaps = [], []
        for p in self.periods:
            s, f = DiscriminatorP(
                p, channels=self.channels, dtype=self.dtype, name=f"disc_p{p}"
            )(x)
            scores.append(s)
            fmaps.append(f)
        return scores, fmaps


class DiscriminatorS(nn.Module):
    """Scale discriminator (reference models.py:551-583): grouped 1-D convs.

    ``blocked=True`` (default) runs the grouped k=41 layers whose
    per-group contraction starves the MXU (Cin/g = 8-64) through
    ``ops/blocked_conv.py:blocked_apply_grouped`` — time folded into the
    per-group lanes, measured 1.28-1.42x per layer on TPU. Identical
    param tree and outputs (parity test pins it); layers where the fold's
    FLOP blowup loses (wide per-group dims) stay plain.
    """

    leaky_relu_slope: float = 0.1
    blocked: bool = True
    use_spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    # (ch, k, stride, groups, pad)
    _SPECS = (
        (128, 15, 1, 1, 7),
        (128, 41, 2, 4, 20),
        (256, 41, 2, 16, 20),
        (512, 41, 4, 16, 20),
        (1024, 41, 4, 16, 20),
        (1024, 41, 1, 16, 20),
        (1024, 5, 1, 1, 2),
    )
    # layer index -> s_in time-fold (measured wins only; see blocked_conv)
    _BLOCK_S_IN = {1: 4, 2: 8, 5: 2}

    def _sn_kernel(self, name, kernel, update: bool):
        """Spectral-normalize ``kernel``, with u/v buffers in the
        ``"spectral"`` collection (written only when that collection is
        mutable — i.e. inside the D phase of the GAN step)."""
        cout = kernel.shape[-1]
        d = int(np.prod(kernel.shape[:-1]))

        def init_vec(shape, salt):
            return lambda: _l2normalize(
                jax.random.normal(
                    jax.random.fold_in(self.make_rng("params"), salt),
                    shape,
                    jnp.float32,
                )
            )

        u_var = self.variable("spectral", f"{name}_u", init_vec((cout,), 0))
        v_var = self.variable("spectral", f"{name}_v", init_vec((d,), 1))
        w_bar, u_new, v_new = spectral_norm_kernel(
            kernel, u_var.value, v_var.value, update
        )
        if (
            update
            and not self.is_initializing()
            and self.is_mutable_collection("spectral")
        ):
            u_var.value = u_new
            v_var.value = v_new
        return w_bar

    @nn.compact
    def __call__(self, x, update_spectral: bool = True):
        """x: [B, T] -> (score, fmap). ``update_spectral`` only matters for
        the spectral-norm variant (one power iteration per call, torch
        train-mode semantics); weight-norm discriminators ignore it."""
        from ..ops.blocked_conv import (
            ConvParams,
            WNScale,
            blocked_apply_grouped,
            weight_norm_kernel,
        )

        sn = self.use_spectral_norm

        h = x[:, :, None].astype(self.dtype)
        fmap = []
        for i, (ch, k, s, g, p) in enumerate(self._SPECS):
            s_in = self._BLOCK_S_IN.get(i) if self.blocked else None
            if s_in is not None or sn:
                cin = h.shape[-1]
                kernel, bias = ConvParams(
                    kernel_shape=(k, cin // g, ch),
                    features=ch,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f"convs_{i}_conv",
                )()
                if sn:
                    w = self._sn_kernel(f"convs_{i}", kernel, update_spectral)
                else:
                    scale = WNScale(
                        conv_name=f"convs_{i}_conv", features=ch,
                        name=f"convs_{i}",
                    )()
                    w = weight_norm_kernel(kernel, scale)
            if s_in is not None:
                # zero-pad T to a block multiple, then trim to the plain
                # conv's output length (trailing zeros only ever feed the
                # trimmed slots — same math as the plain zero padding)
                t_in = h.shape[1]
                t_out = (t_in - 1) // s + 1
                rem = (-t_in) % s_in
                if rem:
                    h = jnp.pad(h, ((0, 0), (0, rem), (0, 0)))
                h = blocked_apply_grouped(
                    h, w, bias, k, s, g, s_in, self.dtype
                )[:, :t_out]
            elif sn:
                h = jax.lax.conv_general_dilated(
                    h, w.astype(self.dtype), (s,), [(p, p)],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    feature_group_count=g,
                ) + bias.astype(self.dtype)
            else:
                conv = nn.Conv(
                    ch,
                    kernel_size=(k,),
                    strides=(s,),
                    padding=[(p, p)],
                    feature_group_count=g,
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype,
                    name=f"convs_{i}_conv",
                )
                h = nn.WeightNorm(conv, name=f"convs_{i}")(h)
            h = nn.leaky_relu(h, self.leaky_relu_slope)
            fmap.append(h)

        if sn:
            kernel, bias = ConvParams(
                kernel_shape=(3, h.shape[-1], 1),
                features=1,
                kernel_init=nn.initializers.normal(0.01),
                name="conv_post_conv",
            )()
            w = self._sn_kernel("conv_post", kernel, update_spectral)
            h = jax.lax.conv_general_dilated(
                h, w.astype(self.dtype), (1,), [(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + bias.astype(self.dtype)
        else:
            conv = nn.Conv(
                1, kernel_size=(3,), padding=[(1, 1)],
                kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
                name="conv_post_conv",
            )
            h = nn.WeightNorm(conv, name="conv_post")(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


class MultiScaleDiscriminator(nn.Module):
    """reference models.py:586-613: 3 scales with x2 average pooling; the
    first scale uses spectral norm (models.py:594), the rest weight norm."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_spectral: bool = True):
        scores, fmaps = [], []
        h = x
        for i in range(3):
            if i != 0:
                # AvgPool1d(4, 2, padding=2)
                padded = jnp.pad(h, ((0, 0), (2, 2)))
                h = nn.avg_pool(
                    padded[:, :, None], (4,), strides=(2,), padding="VALID"
                )[:, :, 0]
            s, f = DiscriminatorS(
                use_spectral_norm=(i == 0), dtype=self.dtype,
                name=f"disc_s{i}",
            )(h, update_spectral)
            scores.append(s)
            fmaps.append(f)
        return scores, fmaps


class DiscriminatorR(nn.Module):
    """Resolution discriminator over STFT magnitude (reference mrd.py:7-77).

    ``blocked=True`` (default) runs the C=32 frequency-axis convs in a
    space-to-depth layout (4 F-bins folded into channels -> 128 MXU
    lanes; see ops/blocked_conv.py). Identical params and, after masking
    the block-padding columns each layer, identical outputs.
    """

    n_fft: int = 1024
    hop_length: int = 120
    win_length: int = 600
    leaky_relu_slope: float = 0.2
    blocked: bool = True
    dtype: Dtype = jnp.float32

    _SPECS = (
        (32, (3, 9), (1, 1), ((1, 1), (4, 4))),
        (32, (3, 9), (1, 2), ((1, 1), (4, 4))),
        (32, (3, 9), (1, 2), ((1, 1), (4, 4))),
        (32, (3, 9), (1, 2), ((1, 1), (4, 4))),
        (32, (3, 3), (1, 1), ((1, 1), (1, 1))),
    )

    @nn.compact
    def __call__(self, x):
        """x: [B, T] -> (score, fmap)."""
        pad = (self.n_fft - self.hop_length) // 2
        y = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        # eps>0 is load-bearing: sqrt(re^2+im^2) has a NaN *gradient* at an
        # exactly-zero bin (d sqrt(u) = inf at 0, times du = 0 -> NaN), and
        # generated audio does produce exact-zero bins early in training.
        # Forward deviation from |stft| is < 4e-5 per bin.
        mag = stft_magnitude(
            y, self.n_fft, self.hop_length, self.win_length, center=False, eps=1e-9
        )  # [B, F, TT]
        # the STFT itself stays f32 (numerics); compute below at self.dtype
        h = jnp.swapaxes(mag, 1, 2)[..., None].astype(self.dtype)  # NHWC

        if self.blocked:
            return self._call_blocked(h)

        fmap = []
        for i, (ch, k, s, p) in enumerate(self._SPECS):
            h = _wn_conv2d(
                ch, k, s, list(map(list, p)), f"convs_{i}", dtype=self.dtype
            )(h)
            h = nn.leaky_relu(h, self.leaky_relu_slope)
            fmap.append(h)

        h = _wn_conv2d(
            1, (3, 3), (1, 1), [(1, 1), (1, 1)], "conv_post", dtype=self.dtype
        )(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap

    def _call_blocked(self, h):
        from ..ops.blocked_conv import (
            ConvParams,
            WNScale,
            blocked_apply_2d,
            conv_triples,
            strided_triples,
            weight_norm_kernel,
        )

        S = 4
        b, tt, f_true, _ = h.shape
        nb0 = -(-f_true // S)
        h = jnp.pad(h, ((0, 0), (0, 0), (0, nb0 * S - f_true), (0, 0)))
        h = h.reshape(b, tt, nb0, S)  # [B, TT, NB, S*1]

        def wn_conv(hb, name, cin, cout, kt, kf, triples, bs, t_pad):
            scale = WNScale(conv_name=f"{name}_conv", features=cout, name=name)()
            kernel, bias = ConvParams(
                kernel_shape=(kt, kf, cin, cout),
                features=cout,
                kernel_init=nn.initializers.normal(0.01),
                name=f"{name}_conv",
            )()
            w = weight_norm_kernel(kernel, scale)
            return blocked_apply_2d(
                hb, w, bias, triples, S, S, self.dtype, t_pad, bs
            )

        def unblock(hb, ch, f_cur):
            bb, ttt, nb, _ = hb.shape
            return hb.reshape(bb, ttt, nb * S, ch)[:, :, :f_cur]

        fmap = []
        f_cur = f_true
        for i, (ch, k, s, p) in enumerate(self._SPECS):
            kt, kf = k
            st_f = s[1]
            pf = p[1][0]
            cin = 1 if i == 0 else self._SPECS[i - 1][0]
            triples = (
                conv_triples(kf, 1, S, pad=pf)
                if st_f == 1
                else strided_triples(kf, st_f, pf, S)
            )
            h = wn_conv(h, f"convs_{i}", cin, ch, kt, kf, triples, st_f, p[0])
            f_cur = (f_cur + 2 * pf - kf) // st_f + 1
            # zero the block-padding columns: the plain path's virtual
            # conv padding is zero there, but bias (and later mixing)
            # would pollute the next layer's edge outputs
            nb = h.shape[2]
            mask = np.repeat(
                (np.arange(nb * S) < f_cur).reshape(nb, S), ch, axis=1
            )
            h = h * jnp.asarray(mask, h.dtype)
            h = nn.leaky_relu(h, self.leaky_relu_slope)
            fmap.append(unblock(h, ch, f_cur))

        h = wn_conv(
            h, "conv_post", self._SPECS[-1][0], 1, 3, 3,
            conv_triples(3, 1, S, pad=1), 1, (1, 1),
        )
        h = unblock(h, 1, f_cur)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


class MultiResolutionDiscriminator(nn.Module):
    resolutions: Sequence[Tuple[int, int, int]] = (
        (1024, 120, 600),
        (2048, 240, 1200),
        (512, 50, 240),
    )
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores, fmaps = [], []
        for n_fft, hop, win in self.resolutions:
            s, f = DiscriminatorR(
                n_fft, hop, win, dtype=self.dtype,
                name=f"disc_r{n_fft}_{hop}",
            )(x)
            scores.append(s)
            fmaps.append(f)
        return scores, fmaps


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def discriminator_loss(real_scores, fake_scores, average: bool = False):
    """LSGAN D loss (reference models.py:627-640 summed; hifisinger_v2.py
    :134-142 averaged/halved)."""
    losses = []
    for dr, dg in zip(real_scores, fake_scores):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        r_loss = jnp.mean((1.0 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        losses.append((r_loss + g_loss) / 2 if average else r_loss + g_loss)
    total = sum(losses)
    if average:
        total = total / len(losses)
    return total


def generator_adv_loss(fake_scores, average: bool = False):
    """LSGAN G loss (reference models.py:643-649; averaged in v2)."""
    losses = [
        jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2) for dg in fake_scores
    ]
    total = sum(losses)
    if average:
        total = total / len(losses)
    return total


def feature_loss(fmap_real, fmap_fake):
    """Feature matching (reference models.py:616-624): L1 over every map, x2."""
    loss = 0.0
    for dr, dg in zip(fmap_real, fmap_fake):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(
                jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32))
            )
    return loss * 2.0


def envelope_loss(y: jax.Array, y_hat: jax.Array, kernel: int = 100, stride: int = 50):
    """Max-pool envelope L1, both polarities (reference hifisinger_v2.py
    :100-115). y: [B, T]."""

    def envelope(sig):
        return nn.max_pool(
            sig[:, :, None], (kernel,), strides=(stride,), padding="VALID"
        )[:, :, 0]

    return jnp.mean(jnp.abs(envelope(y) - envelope(y_hat))) + jnp.mean(
        jnp.abs(envelope(-y) - envelope(-y_hat))
    )


def _smooth_l1(a, b):
    d = jnp.abs(a - b)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def multi_scale_mel_loss(
    y: jax.Array,
    y_hat: jax.Array,
    sampling_rate: int,
    scales: Sequence[Tuple[int, int, int]],
    loss: str = "smoothed-l1",
    f_min: float = 40.0,
    f_max: float = 16000.0,
    n_mels: int = 128,
):
    """Multi-scale log-mel loss (reference hifisinger_v2.py:89-97 and
    hifisinger_v1 aux loss). scales: [(n_fft, hop, win), ...]. y: [B, T]."""
    losses = []
    for n_fft, hop, win in scales:
        mt = LogMelSpectrogram(
            sample_rate=sampling_rate,
            n_fft=n_fft,
            win_length=win,
            hop_length=hop,
            f_min=f_min,
            f_max=f_max,
            n_mels=n_mels,
        )
        a = mt.wav2spec(y)
        b = mt.wav2spec(y_hat)
        if loss == "smoothed-l1":
            losses.append(_smooth_l1(a, b))
        else:
            losses.append(jnp.mean(jnp.abs(a - b)))
    return sum(losses) / len(losses)


def multi_scale_stft_loss(
    y: jax.Array,
    y_hat: jax.Array,
    scales: Sequence[Tuple[int, int, int]] = (
        (512, 128, 512),
        (1024, 256, 1024),
        (2048, 512, 2048),
    ),
):
    """Multi-scale linear-STFT magnitude L1 (reference
    tools/nsf_hifigan/train.py aux losses). y: [B, T]."""
    losses = []
    for n_fft, hop, win in scales:
        a = stft_magnitude(y, n_fft, hop, win, center=True)
        b = stft_magnitude(y_hat, n_fft, hop, win, center=True)
        losses.append(jnp.mean(jnp.abs(a - b)))
    return sum(losses) / len(losses)
