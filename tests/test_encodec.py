"""Contract tests for the Encodec feature extractor
(``extractors/tokenizers.py:Encodec``; reference
``modules/feature_extractors/encodec.py:10-56``).

The real HF ``EncodecModel`` is network-gated on this image, so the torch
model is mocked; these tests pin the code-path logic the wrapper owns:
resampling to 24 kHz, the ``[1, C, T]`` code layout, the
``first_codebook_only`` mode, the int64 decode contract, and lazy
single-load of the model.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest
import torch

from fish_diffusion_tpu.extractors.tokenizers import Encodec


class _FakeEncodeOut:
    def __init__(self, codes):
        self.audio_codes = codes  # [n_chunks, B, n_codebooks, T]


class _FakeDecodeOut:
    def __init__(self, audio):
        self.audio_values = audio  # [B, 1, T_samples]


class _FakeEncodecModel:
    """Mimics transformers.EncodecModel's encode/decode surface.

    encode: one code frame per 320 input samples (24 kHz Encodec hop),
    8 codebooks at bandwidth 6.0. decode: 320 samples per code frame.
    """

    hop = 320
    n_codebooks = 8

    def __init__(self):
        self.encode_calls = []
        self.decode_calls = []

    def eval(self):
        return self

    def encode(self, audio, bandwidth=None):
        assert isinstance(audio, torch.Tensor)
        assert audio.ndim == 3 and audio.shape[:2] == (1, 1), audio.shape
        self.encode_calls.append((tuple(audio.shape), bandwidth))
        t = audio.shape[-1] // self.hop
        codes = torch.arange(self.n_codebooks * t, dtype=torch.int64).reshape(
            1, 1, self.n_codebooks, t
        )
        return _FakeEncodeOut(codes)

    def decode(self, codes, scales):
        assert isinstance(codes, torch.Tensor)
        assert codes.dtype == torch.int64, codes.dtype
        assert codes.ndim == 4 and codes.shape[:2] == (1, 1), codes.shape
        assert scales == [None], scales
        self.decode_calls.append(tuple(codes.shape))
        t = codes.shape[-1]
        audio = torch.linspace(0, 1, t * self.hop).reshape(1, 1, -1)
        return _FakeDecodeOut(audio)


@pytest.fixture()
def fake_encodec(monkeypatch):
    """Patch transformers.EncodecModel.from_pretrained with the fake."""
    import transformers

    model = _FakeEncodecModel()
    loads = []

    class _Loader:
        @staticmethod
        def from_pretrained(name):
            loads.append(name)
            return model

    monkeypatch.setattr(transformers, "EncodecModel", _Loader, raising=False)
    return model, loads


def test_call_resamples_and_returns_code_layout(fake_encodec):
    model, loads = fake_encodec
    ex = Encodec(model_name="local/encodec")
    audio_44k = np.random.default_rng(0).standard_normal(44100).astype(np.float32)

    codes = ex(audio_44k, sampling_rate=44100)

    # resampled to the extractor's 24 kHz rate before encode
    (shape, bandwidth) = model.encode_calls[0]
    assert shape == (1, 1, 24000)
    assert bandwidth == 6.0
    # [1, C, T] float32 contract (reference encodec.py:28-30 returns the
    # code matrix as content features)
    assert codes.shape == (1, 8, 24000 // model.hop)
    assert codes.dtype == np.float32
    assert loads == ["local/encodec"]


def test_first_codebook_only(fake_encodec):
    model, _ = fake_encodec
    ex = Encodec(model_name="local/encodec", first_codebook_only=True)
    audio = np.zeros(24000, np.float32)

    codes = ex(audio, sampling_rate=24000)

    assert codes.shape == (1, 1, 24000 // model.hop)
    # first codebook of the fake is row 0 of the arange grid
    t = 24000 // model.hop
    np.testing.assert_array_equal(codes[0, 0], np.arange(t, dtype=np.float32))


def test_stereo_input_downmixed(fake_encodec):
    model, _ = fake_encodec
    ex = Encodec(model_name="local/encodec")
    stereo = np.stack([np.ones(24000), -np.ones(24000)]).astype(np.float32)

    ex(stereo, sampling_rate=24000)

    (shape, _) = model.encode_calls[0]
    assert shape == (1, 1, 24000)  # mono after preprocess


def test_decode_from_codes_contract(fake_encodec):
    model, _ = fake_encodec
    ex = Encodec(model_name="local/encodec")
    codes = np.random.default_rng(1).integers(0, 1024, size=(8, 50))

    audio = ex.decode(codes.astype(np.float32))  # float codes get cast

    assert model.decode_calls == [(1, 1, 8, 50)]
    assert audio.shape == (50 * model.hop,)
    assert audio.dtype == np.float32 or audio.dtype == np.float64


def test_model_loaded_once_and_lazily(fake_encodec):
    model, loads = fake_encodec
    ex = Encodec(model_name="local/encodec")
    assert loads == []  # lazy: nothing loaded at construction

    audio = np.zeros(24000, np.float32)
    ex(audio, sampling_rate=24000)
    ex(audio, sampling_rate=24000)
    ex.decode(np.zeros((8, 4), np.int64))
    assert loads == ["local/encodec"]  # single shared load


def test_registered_in_feature_extractors():
    from fish_diffusion_tpu.registry import FEATURE_EXTRACTORS

    assert "Encodec" in FEATURE_EXTRACTORS
