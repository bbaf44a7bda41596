"""True numerical parity: reference torch LlamaDenoiser (HF LlamaModel trunk
+ fish projections, modules/llama.py:23-105) -> converter -> flax."""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax.numpy as jnp

REF = Path("/root/reference/fish_diffusion/modules/llama.py")
WN = Path("/root/reference/fish_diffusion/modules/wavenet.py")


def load_reference():
    for n in ("fish_diffusion", "fish_diffusion.modules"):
        if n not in sys.modules:
            pkg = types.ModuleType(n)
            pkg.__path__ = []
            sys.modules[n] = pkg
    if "fish_diffusion.modules.wavenet" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "fish_diffusion.modules.wavenet", WN
        )
        wn = importlib.util.module_from_spec(spec)
        sys.modules["fish_diffusion.modules.wavenet"] = wn
        spec.loader.exec_module(wn)

    spec = importlib.util.spec_from_file_location("ref_llama", REF)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _load_tool(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
def test_converted_llama_denoiser_matches_torch():
    ref = load_reference()

    H, LAYERS, HEADS, INTER, VOCAB, MEL = 32, 2, 2, 64, 50, 16
    torch.manual_seed(0)
    tnet = ref.LlamaDenoiser(
        diffusion_channels=MEL,
        hidden_size=H,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        vocab_size=VOCAB,
        attention_dropout=0.0,
    )
    tnet.eval()

    rng = np.random.default_rng(17)
    B, T_MEL, T_TOK = 2, 10, 6
    x = rng.standard_normal((B, MEL, T_MEL)).astype(np.float32)
    tokens = rng.integers(0, VOCAB, (B, T_TOK))
    t = np.array([7, 300], np.int64)

    with torch.no_grad():
        t_out = tnet(
            torch.from_numpy(x),
            torch.from_numpy(t),
            torch.from_numpy(tokens),
        ).numpy()

    convert = _load_tool(
        "/root/repo/tools/tts/convert_llama_checkpoint.py", "llama_convert"
    ).convert_llama_denoiser

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params = convert(sd, heads=HEADS)

    from fish_diffusion_tpu.models.llama import LlamaDenoiser

    jnet = LlamaDenoiser(
        diffusion_channels=MEL,
        hidden_size=H,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        vocab_size=VOCAB,
    )
    j_out = jnet.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(t),
        jnp.asarray(tokens),
    )
    j_out = np.asarray(j_out).transpose(0, 2, 1)

    np.testing.assert_allclose(j_out, t_out, atol=3e-4, rtol=1e-3)
