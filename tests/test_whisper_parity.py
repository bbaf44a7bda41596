"""Numerical parity for the AlignedWhisper tower (VERDICT r2 missing #3).

The audio encoder backs the whole SVS-from-score path
(``tools/diffusion/inference_svs.py``); the reference builds it from
OpenAI Whisper weights (``modules/feature_extractors/whisper.py:52-78``).
Here the flax ``WhisperAudioEncoder`` + the checkpoint converter are pinned
against ``transformers.WhisperModel.encoder`` (same architecture, HF's
encoder sinusoids are the OpenAI ones), and the 80-mel/16 kHz front end is
pinned against a torch re-implementation of OpenAI's
``log_mel_spectrogram``.
"""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp


def _load_tool(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _hf_to_openai_names(sd):
    """transformers WhisperEncoder state dict -> OpenAI whisper names (the
    layout our converter consumes)."""
    out = {}
    for k, v in sd.items():
        v = v.numpy()
        if k.startswith("conv1.") or k.startswith("conv2."):
            out[k] = v
        elif k.startswith("layer_norm."):
            out[k.replace("layer_norm.", "ln_post.")] = v
        elif k.startswith("layers."):
            _, i, rest = k.split(".", 2)
            rest = (
                rest.replace("self_attn_layer_norm.", "attn_ln.")
                .replace("self_attn.q_proj.", "attn.query.")
                .replace("self_attn.k_proj.", "attn.key.")
                .replace("self_attn.v_proj.", "attn.value.")
                .replace("self_attn.out_proj.", "attn.out.")
                .replace("final_layer_norm.", "mlp_ln.")
                .replace("fc1.", "mlp.0.")
                .replace("fc2.", "mlp.2.")
            )
            out[f"blocks.{i}.{rest}"] = v
        # embed_positions: sinusoidal, recomputed on the flax side
    return out


class TestAudioEncoderParity:
    def test_converted_encoder_matches_transformers(self):
        cfg = transformers.WhisperConfig(
            d_model=64,
            encoder_layers=2,
            encoder_attention_heads=2,
            decoder_layers=1,
            decoder_attention_heads=2,
            encoder_ffn_dim=256,  # whisper always uses 4*d_model
            decoder_ffn_dim=128,
            num_mel_bins=80,
            max_source_positions=64,
        )
        torch.manual_seed(0)
        tenc = transformers.WhisperModel(cfg).encoder
        tenc.eval()

        rng = np.random.default_rng(7)
        T = cfg.max_source_positions * 2  # HF requires the full context
        mel = rng.standard_normal((1, 80, T)).astype(np.float32) * 0.5

        with torch.no_grad():
            t_out = tenc(torch.from_numpy(mel)).last_hidden_state.numpy()

        convert = _load_tool(
            "/root/repo/tools/whisper/convert_whisper_checkpoint.py",
            "whisper_convert",
        ).convert_audio_encoder
        params = convert(_hf_to_openai_names(tenc.state_dict()), n_head=2)

        from fish_diffusion_tpu.extractors.whisper import WhisperAudioEncoder

        jenc = WhisperAudioEncoder(
            n_mels=80,
            n_ctx=cfg.max_source_positions,
            n_state=64,
            n_head=2,
            n_layer=2,
        )
        j_out = jenc.apply({"params": params}, jnp.asarray(mel))

        assert j_out.shape == t_out.shape
        np.testing.assert_allclose(
            np.asarray(j_out), t_out, atol=2e-5, rtol=1e-4
        )

    def test_sinusoids_match_transformers(self):
        from fish_diffusion_tpu.extractors.whisper import sinusoids

        cfg = transformers.WhisperConfig(
            d_model=64,
            encoder_layers=1,
            encoder_attention_heads=2,
            decoder_layers=1,
            decoder_attention_heads=2,
            max_source_positions=48,
            num_mel_bins=80,
        )
        torch.manual_seed(1)
        tenc = transformers.WhisperModel(cfg).encoder
        hf_pos = tenc.embed_positions.weight.detach().numpy()
        ours = sinusoids(48, 64)
        np.testing.assert_allclose(ours, hf_pos, atol=1e-5)


class TestLogMelFrontEnd:
    def test_matches_openai_log_mel(self):
        """Golden: whisper_log_mel == OpenAI whisper.audio.log_mel_spectrogram
        (re-implemented here with torch.stft + the slaney mel bank)."""
        from fish_diffusion_tpu.extractors.whisper import whisper_log_mel
        from fish_diffusion_tpu.ops.mel import mel_filter_bank

        rng = np.random.default_rng(3)
        audio = (rng.standard_normal(16000) * 0.2).astype(np.float32)

        # torch reference, following openai/whisper audio.py exactly
        x = torch.from_numpy(audio)
        window = torch.hann_window(400)
        stft = torch.stft(
            x, 400, 160, window=window, center=True, return_complex=True
        )
        magnitudes = stft[..., :-1].abs() ** 2
        fb = torch.from_numpy(
            np.asarray(mel_filter_bank(16000, 400, 80, 0.0, 8000.0))
        )
        mel_spec = fb.float() @ magnitudes
        log_spec = torch.clamp(mel_spec, min=1e-10).log10()
        log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
        expected = ((log_spec + 4.0) / 4.0).numpy()

        got = np.asarray(whisper_log_mel(audio))[0]
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=3e-5, rtol=1e-4)


class TestAlignedWhisperRoundTrip:
    def test_save_load_forward_consistency(self, tmp_path):
        """ForAudio extractor: save -> load -> identical features, and the
        audio/phone towers project into the same n_outputs space
        (reference whisper.py:80-240 save/load contract)."""
        from fish_diffusion_tpu.extractors.whisper import (
            AlignedWhisperForAudio,
            AlignedWhisperForPhones,
        )

        dims = dict(
            n_mels=80,
            n_phones=12,
            n_audio_ctx=1500,
            n_audio_state=32,
            n_audio_head=2,
            n_audio_layer=2,
            n_outputs=16,
        )
        ex = AlignedWhisperForAudio(random_init=True, **dims)
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        feats = ex(audio, sampling_rate=16000)
        assert feats.shape[1] == 16
        # 8000 samples @ hop 160 -> 50 mel frames -> 25 encoder frames
        assert feats.shape[2] == 25

        path = tmp_path / "aligned.pkl"
        ex.save(path)
        ex2 = AlignedWhisperForPhones(checkpoint=str(path))
        feats2 = AlignedWhisperForAudio.__call__(ex2, audio, sampling_rate=16000)
        np.testing.assert_allclose(feats, feats2, atol=1e-6)

        phones = np.arange(10) % 12
        pf = ex2(phones)
        assert pf.shape == (1, 16, 10)
