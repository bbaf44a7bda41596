"""WORLD-family pitch estimators (DIO + StoneMask + Harvest), native JAX.

The reference wraps pyworld's C implementations
(``/root/reference/fish_diffusion/modules/pitch_extractors/world.py:8-38``:
``pw.dio``/``pw.harvest`` + ``pw.stonemask``). pyworld does not exist in
this image and its event-driven C loops do not map to TPU, so this module
re-implements the *algorithms* in vectorized JAX (Harvest's stages are
documented at its own section below):

DIO (Morise et al., "DIO: a fast and reliable F0 estimator", and the
pyworld ``dio.cpp`` pipeline):
  1. a bank of low-pass filters at half-octave-spaced cutoff frequencies
     (``boundary_f0`` channels) isolates the fundamental in the channel
     whose cutoff brackets the true f0;
  2. per channel, FOUR event-interval period estimates — intervals between
     negative→positive zero crossings, positive→negative crossings, peaks
     and dips — with sub-sample event-time interpolation;
  3. a channel's candidate is the mean of the four estimates; its
     reliability score is their relative spread (they only agree when the
     channel's filtered signal is a near-sinusoid at the fundamental);
  4. the best (lowest-spread) candidate per frame wins; unstable frames are
     unvoiced, plus a median-consistency fix step in the spirit of
     pyworld's ``FixF0Contour``.
  TPU mapping: the event-interval stage is the interesting part — pyworld
  walks event lists in C; here events become boolean masks and the
  "interval containing sample t" is recovered with two associative
  cummax scans (prev/next event time), so the whole estimator is O(T)
  tensor ops under one jit, batched over filter channels.

StoneMask (pyworld ``stonemask.cpp``): refine each voiced frame by
instantaneous frequency: window 3 periods around the frame center, evaluate
the windowed DFT and its time-derivative spectrum at harmonics k*f0
(k=1..6), IF_k = (Re X_k * Im Y_k - Im X_k * Re Y_k) / (2*pi*|X_k|^2),
refined f0 = sum_k |X_k| * IF_k / k / sum_k |X_k|, iterated twice. Fixed
window buffer (3 periods of ``f0_min``); per-frame Hann support scales with
the candidate period so short periods are not over-windowed.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import PITCH_EXTRACTORS
from .pitch import BasePitchExtractor

_N_EVENT_TYPES = 4


def _decimation_factor(sr: int, f0_max: float, hop_length: int) -> int:
    """Largest power-of-two decimation for the candidate stage.

    pyworld decimates before its candidate stages (``dio.cpp`` /
    ``harvest.cpp`` both run on a reduced-rate waveform) because event
    intervals only need resolution up to ``f0_max`` — full precision comes
    from the full-rate instantaneous-frequency refinement afterwards. We
    keep ≥6 samples per period of the highest channel (sub-sample event
    interpolation stays well inside the ±10 % candidate gates) and require
    the decimated rate and hop to stay integral so frame centers map
    exactly.
    """
    d = 1
    while (
        sr % (2 * d) == 0
        and hop_length % (2 * d) == 0
        and sr / (2 * d) >= max(4000.0, 6.0 * f0_max)
    ):
        d *= 2
    return d


def _cummax(x, reverse=False):
    return jax.lax.associative_scan(jnp.maximum, x, reverse=reverse)


def _interval_f0(sig: jax.Array, sr: int) -> jax.Array:
    """Per-sample f0 from intervals between up-crossings of ``sig``.

    For each sample t, the estimate is sr / (t_next - t_prev) where
    t_prev/t_next are the sub-sample times of the up-crossing events
    bracketing t. 0 where no bracketing pair exists.
    """
    y0, y1 = sig[:-1], sig[1:]
    cross = (y0 < 0) & (y1 >= 0)
    frac = -y0 / jnp.maximum(y1 - y0, 1e-12)
    t_event = jnp.arange(sig.shape[0] - 1, dtype=jnp.float32) + frac

    prev_t = _cummax(jnp.where(cross, t_event, -jnp.inf))
    next_t = -_cummax(jnp.where(cross, -t_event, -jnp.inf), reverse=True)

    # interval that CONTAINS sample t: the previous event strictly before
    # the next one (identical only at the event sample itself — fine)
    interval = next_t - prev_t
    good = jnp.isfinite(interval) & (interval > 0)
    f0 = jnp.where(good, sr / jnp.maximum(interval, 1e-6), 0.0)
    # pad back to T samples
    return jnp.concatenate([f0, f0[-1:]])


def _nuttall_lowpass(cutoff_hz: float, sr: int) -> np.ndarray:
    """Windowed-sinc low-pass FIR (Nuttall window, as pyworld's DIO uses
    for its channel filters). Host-side design."""
    half = int(round(2.0 * sr / cutoff_hz))
    n = 2 * half + 1
    t = np.arange(n) - half
    h = np.sinc(2.0 * cutoff_hz / sr * t) * (2.0 * cutoff_hz / sr)
    m = np.arange(n) / (n - 1)
    w = (
        0.355768
        - 0.487396 * np.cos(2 * np.pi * m)
        + 0.144232 * np.cos(4 * np.pi * m)
        - 0.012604 * np.cos(6 * np.pi * m)
    )
    h = h * w
    return (h / h.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _dio_candidates(
    x: jax.Array,
    sr: int,
    hop_length: int,
    f0_min: float,
    f0_max: float,
    channels_in_octave: int = 2,
):
    """DIO stages 1-3: filter bank -> event intervals -> per-frame
    (candidate, spread) per channel.

    Runs on a band-limited decimated waveform (see ``_decimation_factor``;
    pyworld's DIO likewise decimates before its candidate stage) — the
    decimation is exact rfft truncation of the one signal FFT we already
    compute, so it is free.

    Returns (cands [C, F], costs [C, F], centers [F]).
    """
    T = x.shape[0]
    n_frames = T // hop_length + 1
    centers = jnp.minimum(jnp.arange(n_frames) * hop_length, T - 1)

    D = _decimation_factor(sr, f0_max, hop_length)
    sr_d = sr // D
    T_d = -(-T // D)
    hop_d = hop_length // D
    centers_d = jnp.minimum(jnp.arange(n_frames) * hop_d, T_d - 1)

    n_ch = max(
        1,
        int(math.ceil(math.log2(f0_max / f0_min) * channels_in_octave)),
    )
    cutoffs = [
        f0_min * 2.0 ** ((i + 1) / channels_in_octave) for i in range(n_ch)
    ]

    # one FFT of the signal; channel filters (designed at the decimated
    # rate) applied in frequency space on the truncated spectrum
    max_len = max(2 * int(round(2.0 * sr_d / c)) + 1 for c in cutoffs)
    nfft_d = 1 << int(math.ceil(math.log2(T_d + max_len)))
    X = jnp.fft.rfft(x, n=nfft_d * D)
    X_d = X[: nfft_d // 2 + 1] / D  # exact band-limited decimation

    # frame RMS for the silence gate (pyworld has no explicit gate — its
    # event lists degenerate on noise; our filter bank instead *resonates*
    # on noise, so quiet frames must be masked explicitly)
    frame_idx = jnp.minimum(
        centers[:, None] + jnp.arange(hop_length)[None, :] - hop_length // 2,
        T - 1,
    )
    frame_rms = jnp.sqrt(jnp.mean(x[jnp.maximum(frame_idx, 0)] ** 2, axis=1))

    cands, costs = [], []
    for cutoff in cutoffs:
        h = _nuttall_lowpass(cutoff, sr_d)
        half = (len(h) - 1) // 2
        H = jnp.fft.rfft(jnp.asarray(h), n=nfft_d)
        y = jnp.fft.irfft(X_d * H, n=nfft_d)[half : half + T_d]
        dy = jnp.diff(y, append=y[-1:])

        ests = jnp.stack(
            [
                _interval_f0(y, sr_d),  # zero crossings up
                _interval_f0(-y, sr_d),  # zero crossings down
                _interval_f0(dy, sr_d),  # dips (derivative up-crossings)
                _interval_f0(-dy, sr_d),  # peaks
            ]
        )  # [4, T_d]
        ests_f = ests[:, centers_d]  # [4, F]
        # a frame center landing exactly on an event sample reads 0 from
        # that estimator; the neighbor sample carries the interval
        ests_n = ests[:, jnp.minimum(centers_d + 1, T_d - 1)]
        ests_f = jnp.where(ests_f > 0, ests_f, ests_n)

        mean = ests_f.mean(axis=0)
        spread = jnp.sqrt(
            jnp.maximum(((ests_f - mean) ** 2).mean(axis=0), 0.0)
        )
        ok = (
            (ests_f > 0).all(axis=0)
            & (mean >= max(f0_min, cutoff / 2))
            & (mean <= min(f0_max, cutoff))
        )
        cands.append(jnp.where(ok, mean, 0.0))
        costs.append(
            jnp.where(ok, spread / jnp.maximum(mean, 1e-6), jnp.inf)
        )

    return jnp.stack(cands), jnp.stack(costs), frame_rms


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _dio_select(
    cands, costs, frame_rms,
    stability_threshold=0.12, fix_range=0.15, silence_threshold=0.005,
):
    """DIO stage 4: best channel per frame + FixF0Contour-style cleanup +
    silence gate (see ``_dio_candidates``)."""
    best = jnp.argmin(costs, axis=0)
    idx = jnp.arange(cands.shape[1])
    f0 = cands[best, idx]
    cost = costs[best, idx]
    voiced = (
        jnp.isfinite(cost)
        & (cost < stability_threshold)
        & (frame_rms > silence_threshold)
    )
    f0 = jnp.where(voiced, f0, 0.0)

    # fix step: a voiced frame must agree with its 3-frame median within
    # fix_range (removes isolated octave spikes, pyworld FixStep1/2 spirit)
    left = jnp.concatenate([f0[:1], f0[:-1]])
    right = jnp.concatenate([f0[1:], f0[-1:]])
    med = jnp.median(jnp.stack([left, f0, right]), axis=0)
    ok = jnp.abs(f0 - med) <= fix_range * jnp.maximum(med, 1e-6)
    return jnp.where(ok, f0, 0.0)


def _if_estimate(frames, t_rel, sr, f_cur, n_harmonics):
    """One instantaneous-frequency pass shared by StoneMask and Harvest
    refinement: amp-weighted average of IF_k/k over harmonics, plus the
    amp-weighted absolute deviation of IF_k/k from that average (Harvest's
    ``GetRefinedF0`` reliability signal).

    frames: [F, L] windows centered on frame times, t_rel: [L] seconds,
    f_cur: [F] -> (refined [F], deviation [F]).
    """
    period = 1.0 / f_cur  # [F]
    # Hann over +-1.5 periods, zero outside
    arg = t_rel[None, :] / (3.0 * period[:, None])  # [-0.5, 0.5] support
    w = jnp.where(
        jnp.abs(arg) < 0.5, 0.5 + 0.5 * jnp.cos(2 * jnp.pi * arg), 0.0
    )
    wx = w * frames  # [F, L]
    dwx = jnp.gradient(wx, axis=1) * sr  # d/dt of windowed signal

    if_list, amp_list = [], []
    for k in range(1, n_harmonics + 1):
        fk = k * f_cur  # [F]
        ph = -2 * jnp.pi * fk[:, None] * t_rel[None, :]
        c, s = jnp.cos(ph), jnp.sin(ph)
        xr = (wx * c).sum(axis=1)
        xi = (wx * s).sum(axis=1)
        yr = (dwx * c).sum(axis=1)
        yi = (dwx * s).sum(axis=1)
        power = xr * xr + xi * xi
        if_hz = (xr * yi - xi * yr) / (2 * jnp.pi * jnp.maximum(power, 1e-12))
        # jnp.gradient's centered difference attenuates a tone's
        # derivative by sinc(w*dt) (~-5 cents on upper harmonics);
        # correct at the evaluation frequency
        wdt = 2 * jnp.pi * fk / sr
        if_hz = if_hz * wdt / jnp.sin(jnp.minimum(wdt, 3.0))
        amp = jnp.sqrt(jnp.maximum(power, 0.0))
        valid = fk < (0.5 * sr)
        amp = jnp.where(valid, amp, 0.0)
        if_list.append(if_hz / k)
        amp_list.append(amp)

    ifs = jnp.stack(if_list)  # [K, F] per-harmonic f0 estimates
    amps = jnp.stack(amp_list)
    den = jnp.maximum(amps.sum(axis=0), 1e-12)
    refined = (amps * ifs).sum(axis=0) / den
    dev = (amps * jnp.abs(ifs - refined[None, :])).sum(axis=0) / den
    return refined, dev


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5))
def _stonemask_refine(
    x: jax.Array,
    sr: int,
    f0: jax.Array,
    centers_hop: int,
    f0_min: float,
    n_harmonics: int = 6,
):
    """Instantaneous-frequency refinement (pyworld stonemask.cpp).

    x: [T], f0: [F] (0 = unvoiced) -> refined [F].
    """
    T = x.shape[0]
    F = f0.shape[0]
    L = int(3.0 * sr / f0_min)
    L += L % 2  # even buffer
    half = L // 2

    centers = jnp.minimum(jnp.arange(F) * centers_hop, T - 1)
    xpad = jnp.pad(x, (half, half))
    gather = centers[:, None] + jnp.arange(L)[None, :]  # offset by -half+half
    frames = xpad[gather]  # [F, L], window t in [-half, half)
    t_rel = (jnp.arange(L, dtype=jnp.float32) - half) / sr  # seconds

    f0_safe = jnp.maximum(f0, f0_min)

    def refine_once(f_cur):
        return _if_estimate(frames, t_rel, sr, f_cur, n_harmonics)[0]

    r1 = refine_once(f0_safe)
    r1 = jnp.where((r1 > 0.5 * f0_safe) & (r1 < 2.0 * f0_safe), r1, f0_safe)
    r2 = refine_once(r1)

    good = (
        (f0 > 0)
        & (jnp.abs(r2 - f0) <= 0.12 * f0)
        & (r2 > 0)
    )
    return jnp.where(good, r2, f0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _dio_f0(x, sr, hop_length, f0_min, f0_max, use_stonemask):
    """Whole DIO(+StoneMask) pipeline under ONE jit: a single device
    dispatch per file (the per-stage jits inline), which matters when the
    host↔device link has per-call latency (see CLAUDE.md tunnel notes)."""
    cands, costs, frame_rms = _dio_candidates(x, sr, hop_length, f0_min, f0_max)
    f0 = _dio_select(cands, costs, frame_rms)
    if use_stonemask:
        f0 = _stonemask_refine(x, sr, f0, hop_length, f0_min)
    return f0


@PITCH_EXTRACTORS.register_module(name="DioPitchExtractor")
class DioPitchExtractor(BasePitchExtractor):
    """Native JAX DIO + StoneMask (reference
    ``modules/pitch_extractors/world.py:24-38``: ``pw.dio`` +
    ``pw.stonemask``). See the module docstring for the algorithm and its
    TPU mapping; measured accuracy is in ``docs/pages/quality.md`` /
    ``tools/pitch_deviation_study.py``."""

    def __init__(self, use_stonemask: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.use_stonemask = use_stonemask

    def __call__(self, x, sampling_rate=44100, pad_to=None):
        x = jnp.asarray(x, jnp.float32).reshape(-1)
        f0 = _dio_f0(
            x,
            int(sampling_rate),
            self.hop_length,
            float(self.f0_min),
            float(self.f0_max),
            self.use_stonemask,
        )
        return self.post_process(x, sampling_rate, f0, pad_to)


# ---------------------------------------------------------------------------
# Harvest (Morise 2017, pyworld harvest.cpp) — native batched JAX.
#
# Harvest differs from DIO in every stage:
#   1. a DENSE bank of BAND-pass filters (Nuttall window modulated by
#      cos(2*pi*boundary_f0*t), ``GetFilteredSignal``) at
#      ``channels_in_octave`` log-spaced centers — each channel resonates
#      only when the signal contains a component near its center;
#   2. the four event-interval estimates (up/down zero crossings, peaks,
#      dips — ``GetFourZeroCrossingIntervals``) must agree with the
#      channel CENTER within +-10% (``GetF0CandidateContour``), yielding a
#      multi-candidate map [channels, frames] rather than DIO's single
#      best channel;
#   3. per frame, distinct candidates are extracted from the map
#      (``DetectOfficialF0Candidates``; here: iterative non-max
#      suppression over the channel axis — top-K by four-estimator
#      agreement, suppressing +-10% neighbors);
#   4. EACH candidate is refined by instantaneous-frequency harmonic
#      analysis and scored by the amp-weighted deviation of its
#      harmonics' IF/k from the refined value (``RefineF0Candidates`` /
#      ``GetRefinedF0``'s reliability score);
#   5. the best-scoring candidate per frame wins; voicing requires a
#      consistent candidate in a neighboring frame
#      (``RemoveUnreliableCandidates``), then a median fix + log-domain
#      FIR smoothing over voiced runs (``FixF0Contour`` /
#      ``SmoothF0Contour``).
# TPU mapping: the filter bank is one host-designed [C, nfft] transfer
# stack; channels run through a chunked ``lax.map`` (vectorized inside a
# chunk, sequential across chunks to bound memory); the event machinery
# reuses the DIO cummax-scan intervals; NMS is K argmin/mask rounds over
# the [C, F] map; refinement is the shared ``_if_estimate`` used by
# StoneMask, vmapped over candidates. Like pyworld, the candidate stage
# runs on a decimated waveform (``_decimation_factor``: exact rfft-
# truncation decimation, 4× at 44.1 kHz); IF refinement at the full rate
# restores precision.
# ---------------------------------------------------------------------------


def _nuttall_bandpass(center_hz: float, sr: int, max_half: int) -> np.ndarray:
    """Band-pass FIR: Nuttall window over 2 periods each side, modulated by
    a cosine at ``center_hz`` (pyworld ``GetFilteredSignal``), centered in a
    common ``2*max_half+1`` buffer so every channel shares one group delay.
    Scale is irrelevant (event times are amplitude-invariant)."""
    half = int(round(2.0 * sr / center_hz))
    n = 2 * half + 1
    m = np.arange(n) / (n - 1)
    w = (
        0.355768
        - 0.487396 * np.cos(2 * np.pi * m)
        + 0.144232 * np.cos(4 * np.pi * m)
        - 0.012604 * np.cos(6 * np.pi * m)
    )
    t = np.arange(n) - half
    h = w * np.cos(2 * np.pi * center_hz * t / sr)
    # unit gain at the center frequency, so the filtered amplitude of a
    # component at f_center equals the component's amplitude — the
    # channel-energy candidate gate below depends on this calibration
    h = h / max(abs(np.sum(h * np.cos(2 * np.pi * center_hz * t / sr))), 1e-9)
    buf = np.zeros(2 * max_half + 1, np.float32)
    buf[max_half - half : max_half + half + 1] = h
    return buf


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _harvest_candidates(
    x: jax.Array,
    sr: int,
    hop_length: int,
    f0_min: float,
    f0_max: float,
    channels_in_octave: int = 24,
):
    """Harvest stages 1-2: dense band-pass bank -> four-event agreement
    gated to +-10% of each channel center.

    Returns (cands [C, F], costs [C, F], frame_rms [F]); cost is the
    four-estimator relative spread (used only to rank NMS picks — the
    real score comes from IF refinement).
    """
    T = x.shape[0]
    n_frames = T // hop_length + 1
    centers = jnp.minimum(jnp.arange(n_frames) * hop_length, T - 1)

    D = _decimation_factor(sr, f0_max, hop_length)
    sr_d = sr // D
    T_d = -(-T // D)
    hop_d = hop_length // D
    centers_d = jnp.minimum(jnp.arange(n_frames) * hop_d, T_d - 1)

    n_ch = max(
        2, int(math.ceil(math.log2(f0_max / f0_min) * channels_in_octave))
    )
    boundary = np.asarray(
        [
            f0_min * 2.0 ** ((i + 1) / channels_in_octave)
            for i in range(n_ch)
        ],
        np.float32,
    )
    max_half = int(round(2.0 * sr_d / boundary[0]))
    nfft_d = 1 << int(math.ceil(math.log2(T_d + 2 * max_half + 1)))
    X = jnp.fft.rfft(x, n=nfft_d * D)
    X_d = X[: nfft_d // 2 + 1] / D  # exact band-limited decimation

    # host-designed transfer stack, padded to a chunk multiple
    chunk = 8
    n_pad = (-n_ch) % chunk
    filt = np.stack(
        [_nuttall_bandpass(float(b), sr_d, max_half) for b in boundary]
        + [np.zeros(2 * max_half + 1, np.float32)] * n_pad
    )
    H = jnp.asarray(np.fft.rfft(filt, n=nfft_d).astype(np.complex64))
    bounds = jnp.asarray(
        np.concatenate([boundary, np.zeros(n_pad, np.float32)])
    )

    frame_idx = jnp.minimum(
        centers[:, None] + jnp.arange(hop_length)[None, :] - hop_length // 2,
        T - 1,
    )
    frame_rms = jnp.sqrt(jnp.mean(x[jnp.maximum(frame_idx, 0)] ** 2, axis=1))
    frame_idx_d = jnp.minimum(
        centers_d[:, None] + jnp.arange(hop_d)[None, :] - hop_d // 2,
        T_d - 1,
    )

    def chunk_fn(Hc):
        y = jnp.fft.irfft(X_d[None, :] * Hc, n=nfft_d)[
            :, max_half : max_half + T_d
        ]  # [chunk, T_d]
        dy = jnp.diff(y, axis=1, append=y[:, -1:])

        def four(yc, dyc):
            return jnp.stack(
                [
                    _interval_f0(yc, sr_d),
                    _interval_f0(-yc, sr_d),
                    _interval_f0(dyc, sr_d),
                    _interval_f0(-dyc, sr_d),
                ]
            )

        ests = jax.vmap(four)(y, dy)  # [chunk, 4, T_d]
        ests_f = ests[:, :, centers_d]
        ests_n = ests[:, :, jnp.minimum(centers_d + 1, T_d - 1)]
        ests_f = jnp.where(ests_f > 0, ests_f, ests_n)  # event-sample fix
        mean = ests_f.mean(axis=1)  # [chunk, F]
        spread = jnp.sqrt(
            jnp.maximum(((ests_f - mean[:, None, :]) ** 2).mean(axis=1), 0.0)
        )
        # channel energy share per frame: a candidate must be backed by a
        # REAL spectral component in its band — narrowband-filtered noise
        # also "oscillates" at the channel center with agreeing event
        # intervals, so event agreement alone admits junk candidates in
        # every channel away from the true partials
        ch_amp = jnp.sqrt(
            jnp.mean(
                y[:, jnp.maximum(frame_idx_d, 0)] ** 2, axis=2
            )
        )  # [chunk, F]
        return mean, spread, ch_amp

    means, spreads, ch_amps = jax.lax.map(
        chunk_fn, H.reshape(-1, chunk, H.shape[-1])
    )
    means = means.reshape(-1, n_frames)[:n_ch]
    spreads = spreads.reshape(-1, n_frames)[:n_ch]
    ch_amps = ch_amps.reshape(-1, n_frames)[:n_ch]
    b = bounds[:n_ch, None]

    ok = (
        (means > 0)
        & (means >= 0.9 * b)
        & (means <= 1.1 * b)
        & (means >= f0_min)
        & (means <= f0_max)
        & (ch_amps > 0.1 * frame_rms[None, :])
    )
    cands = jnp.where(ok, means, 0.0)
    costs = jnp.where(ok, spreads / jnp.maximum(means, 1e-6), jnp.inf)
    return cands, costs, frame_rms


def _harvest_nms(cands, costs, k: int = 4):
    """Harvest stage 3 (``DetectOfficialF0Candidates``): top-``k`` distinct
    candidates per frame from the [C, F] map, suppressing +-10% neighbors
    after each pick. Returns (cand_k [k, F], cost_k [k, F])."""
    idx = jnp.arange(cands.shape[1])
    picks_c, picks_s = [], []
    for _ in range(k):
        best = jnp.argmin(costs, axis=0)  # [F]
        c = cands[best, idx]
        s = costs[best, idx]
        picks_c.append(jnp.where(jnp.isfinite(s), c, 0.0))
        picks_s.append(s)
        close = jnp.abs(cands - c[None, :]) <= 0.1 * jnp.maximum(
            c[None, :], 1e-6
        )
        costs = jnp.where(close, jnp.inf, costs)
        cands = jnp.where(close, 0.0, cands)
    return jnp.stack(picks_c), jnp.stack(picks_s)


@functools.partial(jax.jit, static_argnums=(1, 3, 4, 5))
def _harvest_refine(
    x: jax.Array,
    sr: int,
    cand_k: jax.Array,
    centers_hop: int,
    f0_min: float,
    n_harmonics: int = 6,
):
    """Harvest stage 4 (``RefineF0Candidates``): refine each candidate by
    instantaneous frequency and score it by the amp-weighted relative
    deviation of its harmonics' IF/k (lower = more reliable).

    cand_k: [K, F] (0 = no candidate) -> (refined [K, F], score [K, F]).
    """
    T = x.shape[0]
    F = cand_k.shape[1]
    L = int(3.0 * sr / f0_min)
    L += L % 2
    half = L // 2

    centers = jnp.minimum(jnp.arange(F) * centers_hop, T - 1)
    xpad = jnp.pad(x, (half, half))
    frames = xpad[centers[:, None] + jnp.arange(L)[None, :]]  # [F, L]
    t_rel = (jnp.arange(L, dtype=jnp.float32) - half) / sr

    def one(f0):  # [F] -> (refined [F], dev [F])
        f_safe = jnp.maximum(f0, f0_min)
        r1, _ = _if_estimate(frames, t_rel, sr, f_safe, n_harmonics)
        r1 = jnp.where((r1 > 0.5 * f_safe) & (r1 < 2.0 * f_safe), r1, f_safe)
        r2, dev = _if_estimate(frames, t_rel, sr, r1, n_harmonics)
        good = (f0 > 0) & (r2 > 0) & (jnp.abs(r2 - f0) <= 0.12 * f0)
        return (
            jnp.where(good, r2, 0.0),
            jnp.where(good, dev / jnp.maximum(r2, 1e-6), jnp.inf),
        )

    return jax.vmap(one)(cand_k)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _harvest_finalize(
    cand_k, score_k, frame_rms,
    f0_min: float = 50.0,
    score_scale: float = 6.0,
    silence_threshold: float = 0.005,
):
    """Harvest stage 5: contour selection over the per-frame candidate
    lists (``FixF0Contour``'s continuity role, realized as the praat-style
    candidate Viterbi the repo already owns) + median fix + log-domain FIR
    smoothing over voiced runs (``SmoothF0Contour``).

    Per-frame argmin over IF scores is NOT enough: at a voiced frame the
    2*f0 candidate's harmonics are all real components too, so its IF
    deviation also ~0 — the disambiguators are continuity (Viterbi
    transition cost) and a small low-f0 preference (praat's octave cost),
    exactly the role pyworld's contour-fixing steps play.
    """
    from .pitch import _viterbi_candidates

    valid = jnp.isfinite(score_k) & (cand_k > 0)
    strength = (
        1.0
        - score_scale * jnp.minimum(jnp.where(valid, score_k, 1.0), 1.0)
        - 0.05 * jnp.log2(jnp.maximum(cand_k, 1e-6) / f0_min)
    )
    strength = jnp.where(valid, strength, -1.0)
    # unvoiced candidate: wins outright in silence, competes at 0.45
    # (praat's voicing threshold regime) against weak/absent candidates
    unvoiced = jnp.where(frame_rms > silence_threshold, 0.45, 2.0)
    f0 = _viterbi_candidates(cand_k.T, strength.T, unvoiced)

    # median fix (octave-spike removal, FixF0Contour step 1/2 spirit)
    left = jnp.concatenate([f0[:1], f0[:-1]])
    right = jnp.concatenate([f0[1:], f0[-1:]])
    med = jnp.median(jnp.stack([left, f0, right]), axis=0)
    ok = jnp.abs(f0 - med) <= 0.15 * jnp.maximum(med, 1e-6)
    f0 = jnp.where(ok, f0, 0.0)

    # 3-tap log-domain smoothing where both (post-fix) neighbors are voiced
    # (SmoothF0Contour's FIR, confined to voiced runs)
    left = jnp.concatenate([f0[:1], f0[:-1]])
    right = jnp.concatenate([f0[1:], f0[-1:]])
    lf = jnp.log(jnp.maximum(f0, 1e-6))
    lfl = jnp.log(jnp.maximum(left, 1e-6))
    lfr = jnp.log(jnp.maximum(right, 1e-6))
    inner = (f0 > 0) & (left > 0) & (right > 0)
    sm = jnp.exp(0.25 * lfl + 0.5 * lf + 0.25 * lfr)
    return jnp.where(inner, sm, f0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _harvest_f0(x, sr, hop_length, f0_min, f0_max, channels_in_octave):
    """Whole Harvest pipeline under ONE jit (see ``_dio_f0``): candidate
    maps → NMS → IF refinement → contour Viterbi run as a single device
    dispatch — the previously-unjitted NMS alone was ~30 eager op
    dispatches per file over the device tunnel."""
    cands, costs, frame_rms = _harvest_candidates(
        x, sr, hop_length, f0_min, f0_max, channels_in_octave
    )
    cand_k, _ = _harvest_nms(cands, costs)
    refined, score = _harvest_refine(x, sr, cand_k, hop_length, f0_min)
    return _harvest_finalize(refined, score, frame_rms, f0_min)


@PITCH_EXTRACTORS.register_module(name="HarvestPitchExtractor")
class HarvestPitchExtractor(BasePitchExtractor):
    """Native JAX Harvest (reference ``modules/pitch_extractors/world.py:8-22``:
    ``pw.harvest``). Dense band-pass candidate maps + per-candidate
    instantaneous-frequency refinement — see the section comment above for
    the stage-by-stage pyworld correspondence and TPU mapping. Measured
    accuracy: ``tools/pitch_deviation_study.py`` / ``docs/pages/quality.md``.
    """

    def __init__(self, channels_in_octave: int = 24, **kwargs):
        super().__init__(**kwargs)
        self.channels_in_octave = channels_in_octave

    def __call__(self, x, sampling_rate=44100, pad_to=None):
        x = jnp.asarray(x, jnp.float32).reshape(-1)
        f0 = _harvest_f0(
            x,
            int(sampling_rate),
            self.hop_length,
            float(self.f0_min),
            float(self.f0_max),
            self.channels_in_octave,
        )
        return self.post_process(x, sampling_rate, f0, pad_to)
