"""True numerical parity: reference torch FastSpeech2Encoder (fairseq-style
MultiheadAttention, conv-FFN, RelPositionalEncoding) -> converter -> flax."""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

REF = Path("/root/reference/fish_diffusion/modules/encoders/fast_speech.py")


def load_reference():
    # shim the registry decorator import (`from .builder import ENCODERS`)
    pkg = types.ModuleType("refenc")
    pkg.__path__ = [str(REF.parent)]
    sys.modules["refenc"] = pkg
    builder = types.ModuleType("refenc.builder")

    class _Reg:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls

            return deco

    builder.ENCODERS = _Reg()
    sys.modules["refenc.builder"] = builder

    spec = importlib.util.spec_from_file_location("refenc.fast_speech", REF)
    m = importlib.util.module_from_spec(spec)
    sys.modules["refenc.fast_speech"] = m
    spec.loader.exec_module(m)
    return m


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
def test_converted_fast_speech_matches_torch():
    ref = load_reference()

    IN, H, LAYERS, HEADS = 10, 16, 2, 2
    torch.manual_seed(0)
    tnet = ref.FastSpeech2Encoder(
        input_size=IN,
        hidden_size=H,
        num_layers=LAYERS,
        num_heads=HEADS,
        dropout=0.0,
    )
    tnet.eval()

    rng = np.random.default_rng(3)
    B, T = 2, 24
    contents = rng.standard_normal((B, T, IN)).astype(np.float32)
    # mask last 5 frames of sample 1 (torch: 1 = padding)
    pad = np.zeros((B, T), bool)
    pad[1, -5:] = True

    with torch.no_grad():
        t_out = tnet(
            torch.from_numpy(contents), torch.from_numpy(pad)
        ).numpy()

    sys.path.insert(0, "/root/repo/tools/diffusion")
    from convert_torch_checkpoint import convert_fast_speech

    sd = {f"e.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    params = convert_fast_speech(sd, "e", num_heads=HEADS)

    from fish_diffusion_tpu.models.fast_speech import FastSpeech2Encoder

    jnet = FastSpeech2Encoder(
        input_size=IN, hidden_size=H, num_layers=LAYERS, num_heads=HEADS
    )
    j_out = np.asarray(
        jnet.apply({"params": params}, jnp.asarray(contents), jnp.asarray(pad))
    )

    np.testing.assert_allclose(j_out, t_out, atol=2e-5, rtol=1e-4)
