"""True numerical parity: reference vendored RMVPE net (DeepUnet CNN +
BiGRU -> 360-bin salience) -> converter -> flax E2E, same mel -> same
salience. librosa/torchaudio (absent in this image) are shimmed — only the
net classes are exercised, not the audio frontend."""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = Path("/root/reference/fish_diffusion/modules/pitch_extractors/rmvpe.py")


def load_reference():
    # shims for imports the image does not have
    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")

        def mel(*, sr, n_fft, n_mels, fmin, fmax, htk=True):
            from fish_diffusion_tpu.extractors.rmvpe import htk_mel_filter_bank

            return np.asarray(
                htk_mel_filter_bank(sr, n_fft, n_mels, fmin, fmax)
            )

        filters.mel = mel
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        taf = types.ModuleType("torchaudio.functional")
        ta.functional = taf
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = taf

    pkg = types.ModuleType("refpitch")
    pkg.__path__ = [str(REF.parent)]
    sys.modules["refpitch"] = pkg
    builder = types.ModuleType("refpitch.builder")

    class _Reg:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls

            return deco

    builder.PITCH_EXTRACTORS = _Reg()

    class BasePitchExtractor:
        def __init__(self, *a, **k):
            pass

    builder.BasePitchExtractor = BasePitchExtractor
    sys.modules["refpitch.builder"] = builder

    spec = importlib.util.spec_from_file_location("refpitch.rmvpe", REF)
    m = importlib.util.module_from_spec(spec)
    sys.modules["refpitch.rmvpe"] = m
    spec.loader.exec_module(m)
    return m


def _load_tool(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
def test_converted_rmvpe_net_matches_torch():
    ref = load_reference()

    torch.manual_seed(0)
    # the real model: E2E(4, 1, (2, 2)) per reference rmvpe.py:390
    tnet = ref.E2E(4, 1, (2, 2))
    tnet.eval()

    rng = np.random.default_rng(11)
    B, T, M = 1, 32, 128
    mel = rng.uniform(0, 1, (B, M, T)).astype(np.float32)

    with torch.no_grad():
        t_out = tnet(torch.from_numpy(mel)).numpy()

    convert = _load_tool(
        "/root/repo/tools/preprocessing/convert_rmvpe_checkpoint.py",
        "rmvpe_convert",
    ).convert

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = convert(sd)  # {"params": ..., "batch_stats": ...}

    from fish_diffusion_tpu.extractors.rmvpe import E2E

    jnet = E2E(n_blocks=4, n_gru=1)
    j_out = np.asarray(
        jnet.apply(variables, jnp.asarray(mel.transpose(0, 2, 1)))
    )

    np.testing.assert_allclose(j_out, t_out, atol=5e-5, rtol=1e-3)
