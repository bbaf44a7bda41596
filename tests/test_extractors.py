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
