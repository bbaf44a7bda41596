"""DIO + StoneMask (extractors/world.py) and pYIN (extractors/pitch.py)
accuracy/behavior tests on analytically-known signals.

Reference behaviors matched: pyworld dio+stonemask
(``modules/pitch_extractors/world.py:24-38``) and librosa pyin
(``modules/pitch_extractors/pyin.py:9``).
"""

import numpy as np
import pytest

from fish_diffusion_tpu.extractors.pitch import PyinPitchExtractor
from fish_diffusion_tpu.extractors.world import (
    DioPitchExtractor,
    HarvestPitchExtractor,
    _interval_f0,
)

SR = 44100
HOP = 512


def _tone(f0_frames, sr=SR, hop=HOP, n_harm=6, noise=0.004, seed=0):
    f0_up = np.repeat(f0_frames, hop)
    phase = 2 * np.pi * np.cumsum(f0_up) / sr
    x = np.zeros_like(phase)
    for k in range(1, n_harm + 1):
        x += np.sin(k * phase) / k
    x *= 0.5 / (np.abs(x).max() + 1e-9)
    x *= (f0_up > 0).astype(np.float64)
    rng = np.random.default_rng(seed)
    return (x + noise * rng.standard_normal(len(x))).astype(np.float32)


def _cents(f0, truth):
    m = (f0 > 0) & (truth > 0)
    assert m.mean() > 0.7, f"voiced recall too low: {m.mean()}"
    return np.abs(1200 * np.log2(f0[m] / truth[m]))


class TestIntervalEstimator:
    def test_pure_sine_interval_f0(self):
        import jax.numpy as jnp

        t = np.arange(SR) / SR
        x = jnp.asarray(np.sin(2 * np.pi * 220.0 * t), jnp.float32)
        f0 = np.asarray(_interval_f0(x, SR))
        mid = f0[SR // 4 : 3 * SR // 4]
        # samples landing exactly on an event read 0 (one per period)
        assert (mid > 0).mean() > 0.99
        np.testing.assert_allclose(mid[mid > 0], 220.0, rtol=5e-3)


class TestDio:
    def test_steady_tone_accuracy(self):
        truth = np.full(120, 220.0, np.float32)
        f0 = DioPitchExtractor()( _tone(truth), SR, pad_to=len(truth))
        c = _cents(np.asarray(f0), truth)
        assert c.mean() < 5.0, c.mean()

    def test_vibrato_tracking(self):
        n = 120
        t = np.arange(n)
        truth = (294.0 * 2 ** ((30 / 1200) * np.sin(2 * np.pi * 5 * t * HOP / SR))).astype(np.float32)
        f0 = DioPitchExtractor()(_tone(truth), SR, pad_to=n)
        c = _cents(np.asarray(f0), truth)
        assert c.mean() < 10.0, c.mean()

    def test_silence_is_unvoiced(self):
        truth = np.full(120, 250.0, np.float32)
        truth[:25] = 0.0
        truth[60:80] = 0.0
        f0 = np.asarray(DioPitchExtractor()(_tone(truth), SR, pad_to=120))
        # hard-silent regions must be (mostly) unvoiced
        assert (f0[2:22] == 0).mean() > 0.8
        assert (f0[63:77] == 0).mean() > 0.8

    def test_stonemask_improves_or_keeps(self):
        truth = np.full(120, 220.0, np.float32)
        audio = _tone(truth)
        raw = np.asarray(
            DioPitchExtractor(use_stonemask=False)(audio, SR, pad_to=120)
        )
        ref = np.asarray(DioPitchExtractor()(audio, SR, pad_to=120))
        assert _cents(ref, truth).mean() <= _cents(raw, truth).mean() + 0.5

    def test_harvest_name_registered(self):
        from fish_diffusion_tpu.registry import PITCH_EXTRACTORS

        ex = PITCH_EXTRACTORS.build(dict(type="HarvestPitchExtractor"))
        assert isinstance(ex, HarvestPitchExtractor)
        ex2 = PITCH_EXTRACTORS.build(dict(type="DioPitchExtractor"))
        assert isinstance(ex2, DioPitchExtractor)


class TestHarvest:
    """Native Harvest (band-pass candidate maps + IF refinement + contour
    Viterbi) — pyworld ``pw.harvest`` (reference
    ``modules/pitch_extractors/world.py:8-22``)."""

    def test_steady_tone_subcent(self):
        truth = np.full(120, 220.0, np.float32)
        f0 = HarvestPitchExtractor()(_tone(truth), SR, pad_to=len(truth))
        c = _cents(np.asarray(f0), truth)
        assert c.mean() < 1.0, c.mean()

    def test_high_pitch_no_subharmonic(self):
        """640 Hz: the channel-energy gate must reject noise-resonance
        candidates and the contour Viterbi must not ride a subharmonic."""
        truth = np.full(120, 640.0, np.float32)
        f0 = HarvestPitchExtractor()(_tone(truth), SR, pad_to=len(truth))
        c = _cents(np.asarray(f0), truth)
        assert c.mean() < 5.0, c.mean()

    def test_vibrato_tracking(self):
        n = 120
        t = np.arange(n)
        truth = (
            294.0 * 2 ** ((30 / 1200) * np.sin(2 * np.pi * 5 * t * HOP / SR))
        ).astype(np.float32)
        f0 = HarvestPitchExtractor()(_tone(truth), SR, pad_to=n)
        c = _cents(np.asarray(f0), truth)
        assert c.mean() < 10.0, c.mean()

    def test_silence_is_unvoiced(self):
        truth = np.full(120, 250.0, np.float32)
        truth[:25] = 0.0
        truth[60:80] = 0.0
        f0 = np.asarray(
            HarvestPitchExtractor()(_tone(truth), SR, pad_to=120)
        )
        assert (f0[2:22] == 0).mean() > 0.8
        assert (f0[63:77] == 0).mean() > 0.8
        assert (f0[30:55] > 0).mean() > 0.8


class TestPyin:
    def test_steady_tone_accuracy(self):
        truth = np.full(120, 220.0, np.float32)
        f0 = PyinPitchExtractor()(_tone(truth), SR, pad_to=len(truth))
        c = _cents(np.asarray(f0), truth)
        assert c.mean() < 5.0, c.mean()

    def test_octave_error_suppression(self):
        """The HMM's transition cost must prevent isolated octave jumps on
        a glide (plain YIN's known failure mode)."""
        n = 120
        truth = (150.0 * (420 / 150) ** (np.arange(n) / n)).astype(np.float32)
        f0 = np.asarray(PyinPitchExtractor()(_tone(truth), SR, pad_to=n))
        m = (f0 > 0) & (truth > 0)
        cents = np.abs(1200 * np.log2(f0[m] / truth[m]))
        assert (cents > 600).mean() < 0.03, (cents > 600).mean()

    def test_silence_unvoiced(self):
        truth = np.full(120, 250.0, np.float32)
        truth[50:75] = 0.0
        f0 = np.asarray(PyinPitchExtractor()(_tone(truth), SR, pad_to=120))
        assert (f0[53:72] == 0).mean() > 0.8
