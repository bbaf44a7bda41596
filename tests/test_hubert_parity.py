"""True numerical parity: HF transformers HubertModel -> converter -> flax
HubertEncoder, same raw audio -> same hidden states.

The reference's ContentVec/ChineseHubert extractors wrap HF Hubert
(``modules/feature_extractors/content_vec.py:16-54``); this proves our
reimplementation + converter reproduce the HF forward pass exactly
(standard 512-ch conv frontend, tiny transformer)."""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp


def _load_tool(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_converted_hubert_matches_transformers():
    cfg = transformers.HubertConfig(
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=2,
        intermediate_size=64,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    tnet = transformers.HubertModel(cfg)
    tnet.eval()

    rng = np.random.default_rng(13)
    audio = rng.standard_normal((1, 4000)).astype(np.float32) * 0.1

    with torch.no_grad():
        out = tnet(torch.from_numpy(audio), output_hidden_states=True)
        t_last = out.last_hidden_state.numpy()
        t_mid = out.hidden_states[2].numpy()  # after layer 1

    convert = _load_tool(
        "/root/repo/tools/preprocessing/convert_hubert_checkpoint.py",
        "hubert_convert",
    ).convert_hf_hubert

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params = convert(sd, heads=2)

    from fish_diffusion_tpu.extractors.feature import HubertEncoder

    jnet = HubertEncoder(dim=32, num_layers=3, heads=2, ffn_dim=64)
    hiddens = jnet.apply({"params": params}, jnp.asarray(audio))

    np.testing.assert_allclose(
        np.asarray(hiddens[1]), t_mid, atol=5e-5, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(hiddens[-1]), t_last, atol=5e-5, rtol=1e-3
    )
