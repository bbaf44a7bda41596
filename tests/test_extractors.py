"""Pitch/energy extractor tests: synthetic tones with known f0."""

import jax.numpy as jnp
import numpy as np
import pytest

from fish_diffusion_tpu.extractors import (
    AutocorrPitchExtractor,
    RMSEnergyExtractor,
    YinPitchExtractor,
)
from fish_diffusion_tpu.registry import PITCH_EXTRACTORS

SR = 44100


def tone(freq, seconds=1.0, sr=SR, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestYin:
    @pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
    def test_pure_tone(self, freq):
        ext = YinPitchExtractor(hop_length=512)
        f0 = np.asarray(ext(tone(freq), SR))
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        np.testing.assert_allclose(np.median(voiced), freq, rtol=0.02)

    def test_silence_unvoiced(self):
        ext = YinPitchExtractor(hop_length=512)
        f0 = np.asarray(ext(np.zeros(SR, np.float32), SR))
        assert (f0 == 0).all()

    def test_pad_to_and_keep_zeros(self):
        audio = np.concatenate([tone(220, 0.5), np.zeros(SR // 2, np.float32)])
        ext = YinPitchExtractor(hop_length=512, keep_zeros=False)
        f0 = np.asarray(ext(audio, SR, pad_to=100))
        assert f0.shape == (100,)
        # zero-removal interpolation: no zeros left (voiced region extends)
        assert (f0 > 0).all()

    def test_harmonic_tone(self):
        """f0 detection with harmonics present (more voice-like)."""
        t = np.arange(SR) / SR
        audio = (
            0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.15 * np.sin(2 * np.pi * 660 * t)
        ).astype(np.float32)
        ext = YinPitchExtractor(hop_length=512)
        f0 = np.asarray(ext(audio, SR))
        voiced = f0[f0 > 0]
        np.testing.assert_allclose(np.median(voiced), 220.0, rtol=0.02)


class TestAutocorr:
    @pytest.mark.parametrize("freq", [110.0, 330.0])
    def test_pure_tone(self, freq):
        ext = AutocorrPitchExtractor(hop_length=512)
        f0 = np.asarray(ext(tone(freq), SR))
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        np.testing.assert_allclose(np.median(voiced), freq, rtol=0.02)

    def test_noise_mostly_unvoiced(self):
        noise = np.random.default_rng(0).normal(0, 0.3, SR).astype(np.float32)
        ext = AutocorrPitchExtractor(hop_length=512)
        f0 = np.asarray(ext(noise, SR))
        assert (f0 == 0).mean() > 0.5


class TestAliases:
    def test_legacy_names_registered(self):
        for name in [
            "ParselMouthPitchExtractor",
            "HarvestPitchExtractor",
            "DioPitchExtractor",
            "PyinPitchExtractor",
            "CrepePitchExtractor",  # real flax port (extractors/crepe.py)
        ]:
            cfg = {"type": name, "keep_zeros": False}
            if name == "CrepePitchExtractor":
                cfg.update(model="tiny", random_init=True)
            ext = PITCH_EXTRACTORS.build(cfg)
            f0 = np.asarray(ext(tone(220, 0.3), SR, pad_to=20))
            assert f0.shape == (20,)


class TestRMSEnergy:
    def test_constant_amplitude(self):
        ext = RMSEnergyExtractor()
        audio = tone(220, 1.0, amp=0.5)
        e = ext(audio, SR)
        # RMS of 0.5-amplitude sine = 0.5/sqrt(2)
        np.testing.assert_allclose(
            np.median(e), 0.5 / np.sqrt(2), rtol=0.05
        )

    def test_pad_to(self):
        ext = RMSEnergyExtractor()
        e = ext(tone(220, 0.5), SR, pad_to=37)
        assert e.shape == (37,)

    def test_frame_count_matches_librosa_convention(self):
        ext = RMSEnergyExtractor(frame_length=2048, hop_length=512, center=True)
        e = ext(np.zeros(4096, np.float32), SR)
        # centered: 1 + T // hop frames
        assert e.shape == (1 + 4096 // 512,)


class TestCMVNMel:
    """CMVNMelExtractor: padding-invariant, tilt-removing content features
    (the weight-free content front-end driving the conversion proof)."""

    def _harmonic(self, seconds=1.0, f0=220.0, sr=44100):
        # vibrato keeps the mel bins time-varying (a perfectly static tone
        # has zero per-bin variance — degenerate for any CMVN front-end)
        t = np.arange(int(seconds * sr)) / sr
        f_inst = f0 * 2 ** (0.5 * np.sin(2 * np.pi * 5.5 * t) / 12)
        phase = 2 * np.pi * np.cumsum(f_inst) / sr
        return sum(
            (0.5 / k) * np.sin(k * phase) for k in range(1, 6)
        ).astype(np.float32)

    def test_output_contract_and_gated_stats(self):
        from fish_diffusion_tpu.extractors.feature import CMVNMelExtractor

        ex = CMVNMelExtractor()
        audio = self._harmonic()
        out = ex(audio, 44100)
        assert out.ndim == 3 and out.shape[0] == 1 and out.shape[1] == 128
        assert out.dtype == np.float32
        # active frames are ~zero-mean/unit-std per bin
        assert abs(out.mean()) < 0.3
        assert 0.5 < out.std() < 1.5

    def test_padding_invariance(self):
        """Bucket padding (what callers feed) must not move the features
        of the true frames — the energy gate excludes padding silence.
        (Contract: utterances end in a fade/silence, as real speech and
        the proof corpus do; a hard full-scale cut leaves a spectral
        click frame inside the gate.)"""
        from fish_diffusion_tpu.extractors.feature import CMVNMelExtractor

        ex = CMVNMelExtractor()
        audio = self._harmonic(1.0)
        fade = np.minimum(np.arange(len(audio)) / 2048, 1.0)
        audio = (audio * fade * fade[::-1]).astype(np.float32)
        padded = np.pad(audio, (0, len(audio)))  # 50% zero padding
        a = ex(audio, 44100)
        b = ex(padded, 44100)
        t = a.shape[2] - 2  # ignore the boundary frame
        # STFT boundary frames legitimately differ between the two
        # renderings, shifting the gated stats slightly — the contract is
        # statistical stability on the unit feature scale, not bitwise
        d = np.abs(a[:, :, :t] - b[:, :, :t])
        assert float(d.mean()) < 0.05, d.mean()
        assert float(np.quantile(d, 0.95)) < 0.3, np.quantile(d, 0.95)

    def test_static_tilt_removed(self):
        """A constant spectral tilt (static speaker timbre) must vanish:
        pre-emphasized audio gives ~the same features."""
        from scipy.signal import lfilter

        from fish_diffusion_tpu.extractors.feature import CMVNMelExtractor

        ex = CMVNMelExtractor()
        audio = self._harmonic(1.0)
        tilted = lfilter([1.0, -0.85], [1.0], audio).astype(np.float32)
        a = ex(audio, 44100)
        b = ex(tilted, 44100)
        # mean abs deviation far below the unit feature scale
        assert float(np.abs(a - b).mean()) < 0.25

    def test_registered(self):
        from fish_diffusion_tpu.registry import FEATURE_EXTRACTORS

        assert "CMVNMelExtractor" in FEATURE_EXTRACTORS
