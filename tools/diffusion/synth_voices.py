"""Synthetic multi-speaker singing-voice corpus for the conversion proof.

Three "speakers" share a phone inventory (formant envelopes) and phrase
scores but differ in the attributes a voice-conversion model must move:

- **f0 register** (130.8 / 220 / 330 Hz) with speaker-specific vibrato
  rate/depth,
- **static spectral envelope**: a tilt (dB/octave) plus a fixed resonance
  bump ("singer's formant") — exactly the static timbre that the CMVN
  content features (``extractors/feature.py:CMVNMelExtractor``) remove,
  so timbre can only re-enter through the speaker embedding.

Phrases are parallel across speakers (same phones, durations, and melody
relative to register), which lets the proof render an **oracle target**:
speaker B singing phrase X at speaker A's (transposed) f0 contour — the
ideal output of converting A's recording to B. Mel-L1 against that oracle
is a direct conversion-quality number no loss curve can fake.

Matches the data contract of the reference pipeline
(``tools/preprocessing/extract_features.py``: 44.1 kHz mono wavs in
``train/<speaker>/`` subfolders, reference ``datasets/utils.py:61-96``).
"""

from __future__ import annotations

import numpy as np

SR = 44100
HOP = 512

# (F1, F2, F3) formant centers shared by all speakers; bandwidths fixed.
# Values span vowel space (Peterson-Barney-ish), distinct enough that
# phones are separable in the mel domain.
PHONES = np.asarray(
    [
        (730, 1090, 2440),  # aa
        (270, 2290, 3010),  # iy
        (300, 870, 2240),   # uw
        (530, 1840, 2480),  # eh
        (640, 1190, 2390),  # ah
        (440, 1020, 2240),  # ao
        (390, 1990, 2550),  # ih
        (490, 1350, 1690),  # er
        (660, 1720, 2410),  # ae
        (360, 640, 2360),   # uh (lowered F2 variant)
    ],
    np.float64,
)
BANDWIDTHS = np.asarray([90.0, 120.0, 170.0])
FORMANT_GAINS = np.asarray([1.0, 0.63, 0.35])

SPEAKERS = {
    # register Hz, tilt dB/oct, bump (center Hz, height dB), vibrato (Hz, semitones)
    "bass":    dict(register=130.8, tilt=-9.0, bump=(2600.0, 6.0), vib=(4.6, 0.18)),
    "alto":    dict(register=220.0, tilt=-6.0, bump=(3000.0, 0.0), vib=(5.4, 0.30)),
    "soprano": dict(register=330.0, tilt=-2.5, bump=(3300.0, 4.0), vib=(6.4, 0.45)),
}


def make_phrases(rng: np.random.Generator, n: int, min_phones=6, max_phones=9):
    """Phrase scores: [(phone_id, duration_s, note_semitones), ...]."""
    phrases = []
    for _ in range(n):
        k = int(rng.integers(min_phones, max_phones + 1))
        phones = rng.integers(0, len(PHONES), k)
        durs = rng.uniform(0.3, 0.6, k)
        # melody: random walk in semitones, clipped to +/-7 around register
        steps = rng.integers(-3, 4, k)
        notes = np.clip(np.cumsum(steps) - steps[0], -7, 7)
        phrases.append(list(zip(phones.tolist(), durs.tolist(), notes.tolist())))
    return phrases


def _phrase_frames(phrase, spk, rng, f0_override=None):
    """Frame-rate f0 [T] and phone-weight matrix [T, n_phones]."""
    frame_s = HOP / SR
    n_frames = int(round(sum(d for _, d, _ in phrase) / frame_s))
    t = np.arange(n_frames) * frame_s

    # piecewise-constant phone ids and notes, then smooth
    bounds = np.cumsum([0.0] + [d for _, d, _ in phrase])
    seg = np.clip(np.searchsorted(bounds, t, side="right") - 1, 0, len(phrase) - 1)
    notes = np.asarray([n for _, _, n in phrase], np.float64)[seg]

    # portamento: 60 ms triangular smoothing of the note track
    k = max(int(0.06 / frame_s) | 1, 3)
    win = np.bartlett(k)
    win /= win.sum()
    notes = np.convolve(np.pad(notes, (k // 2, k // 2), mode="edge"), win, "valid")

    if f0_override is not None:
        f0 = np.asarray(f0_override, np.float64)[:n_frames]
        if len(f0) < n_frames:
            f0 = np.pad(f0, (0, n_frames - len(f0)), mode="edge")
    else:
        vib_rate, vib_depth = spk["vib"]
        vibrato = vib_depth * np.sin(
            2 * np.pi * vib_rate * t + rng.uniform(0, 2 * np.pi)
        )
        jitter = np.cumsum(rng.normal(0, 0.004, n_frames))
        jitter -= np.linspace(jitter[0], jitter[-1], n_frames)
        f0 = spk["register"] * 2 ** ((notes + vibrato + jitter) / 12)

    # phone crossfade weights: 50 ms linear fades between segments
    w = np.zeros((n_frames, len(PHONES)))
    onehot = np.zeros((n_frames, len(PHONES)))
    onehot[np.arange(n_frames), [phrase[s][0] for s in seg]] = 1.0
    kf = max(int(0.05 / frame_s) | 1, 3)
    winf = np.bartlett(kf)
    winf /= winf.sum()
    for p in range(len(PHONES)):
        w[:, p] = np.convolve(
            np.pad(onehot[:, p], (kf // 2, kf // 2), mode="edge"), winf, "valid"
        )
    w /= w.sum(axis=1, keepdims=True) + 1e-9
    return f0, w


def _speaker_emphasis_db(freqs: np.ndarray, spk) -> np.ndarray:
    """Static (time-invariant) speaker envelope in dB."""
    tilt = spk["tilt"] * np.log2(np.maximum(freqs, 50.0) / 200.0)
    c, h = spk["bump"]
    bump = h * np.exp(-0.5 * ((freqs - c) / 450.0) ** 2)
    return tilt + bump


def _formant_gain(freqs: np.ndarray, phone_weights: np.ndarray) -> np.ndarray:
    """Lorentzian formant envelope per frame. freqs [T, K] -> gain [T, K]."""
    # envelope per phone at the needed freqs: [P, T, K] is small (P=10)
    gains = np.zeros_like(freqs)
    for p in range(len(PHONES)):
        wp = phone_weights[:, p : p + 1]  # [T, 1]
        if wp.max() < 1e-4:
            continue
        env = np.full_like(freqs, 1e-3)
        for (fc, bw, g) in zip(PHONES[p], BANDWIDTHS, FORMANT_GAINS):
            env += g / (1.0 + ((freqs - fc) / bw) ** 2)
        gains += wp * env
    return gains


def render(phrase, speaker: str, rng: np.random.Generator, f0_override=None):
    """Render one phrase for one speaker -> (audio float32 [N], f0 [T])."""
    spk = SPEAKERS[speaker]
    f0, w = _phrase_frames(phrase, spk, rng, f0_override)
    n_frames = len(f0)

    max_harm = int(min(np.floor(16000.0 / max(f0.min(), 1.0)), 48))
    k = np.arange(1, max_harm + 1)
    freqs = f0[:, None] * k[None, :]  # [T, K]

    amps = _formant_gain(freqs, w) / k[None, :] ** 0.5
    amps *= 10 ** (_speaker_emphasis_db(freqs, spk) / 20)
    amps[freqs > 16000.0] = 0.0

    # overall amplitude envelope: gentle per-phrase arc + fade in/out
    arc = 0.7 + 0.3 * np.sin(np.linspace(0.2, np.pi - 0.2, n_frames))
    fade = np.minimum(np.arange(n_frames) / 8.0, 1.0)
    fade *= fade[::-1]
    amps *= (arc * fade)[:, None]

    # upsample f0/amps to sample rate and sum harmonics
    n = n_frames * HOP
    f0_up = np.repeat(f0, HOP)
    idx = np.arange(n) / HOP
    base = 2 * np.pi * np.cumsum(f0_up) / SR
    audio = np.zeros(n)
    for j, kk in enumerate(k):
        audio += np.interp(idx, np.arange(n_frames), amps[:, j]) * np.sin(kk * base)
    audio /= np.abs(audio).max() + 1e-9
    audio = 0.7 * audio + 5e-4 * rng.standard_normal(n)
    return audio.astype(np.float32), f0.astype(np.float32)
