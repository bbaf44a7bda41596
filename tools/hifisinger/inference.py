"""HiFiSinger inference CLI (parity with reference
``tools/hifisinger/inference.py``: SVCInference subclass that calls the
waveform generator directly — no diffusion — with amplitude renorm)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


class HiFiSingerInference:
    def __init__(self, config, checkpoint):
        import jax

        from fish_diffusion_tpu.config import Config
        from fish_diffusion_tpu.models.hifisinger import HiFiSinger
        from fish_diffusion_tpu.registry import FEATURE_EXTRACTORS, PITCH_EXTRACTORS
        import fish_diffusion_tpu.extractors  # noqa: F401

        if isinstance(config, (str, Path)):
            config = Config.fromfile(config)
        self.config = config

        mc = config.model
        model_cfg = {
            k: v
            for k, v in dict(mc).items()
            if k not in ("type", "mpd", "mrd", "msd", "multi_scale_mels")
        }
        self.model = HiFiSinger(**model_cfg)

        pre = config.preprocessing
        self.text_features_extractor = FEATURE_EXTRACTORS.build(
            dict(pre.text_features_extractor)
        )
        self.pitch_extractor = PITCH_EXTRACTORS.build(dict(pre.pitch_extractor))

        self.sampling_rate = mc.encoder.get("sampling_rate", 44100)
        self.hop_length = mc.encoder.get(
            "hop_length", mc.encoder.get("hop_size", 512)
        )

        import pickle

        with open(checkpoint, "rb") as f:
            state = pickle.load(f)
        self.params = state.get("params_g") or state.get("params") if isinstance(
            state, dict
        ) else state

        self._jit_forward = jax.jit(self._forward_impl)

    def _forward_impl(self, params, speakers, contents, pitches, rng):
        import jax

        return self.model.apply(
            {"params": params},
            speakers=speakers,
            contents=contents,
            pitches=pitches,
            rngs={"noise": rng},
        )

    def forward(self, audio, speaker_id=0, pitch_adjust=0.0, seed=0):
        import jax
        import jax.numpy as jnp

        from fish_diffusion_tpu.ops.tensor import repeat_expand_np

        mel_len = len(audio) // self.hop_length

        pitches = np.asarray(
            self.pitch_extractor(audio, self.sampling_rate, pad_to=mel_len)
        ) * 2 ** (pitch_adjust / 12)

        contents = self.text_features_extractor(audio, self.sampling_rate)
        contents = repeat_expand_np(np.asarray(contents)[0], mel_len).T

        wav = self._jit_forward(
            self.params,
            jnp.asarray([speaker_id], jnp.int32),
            jnp.asarray(contents)[None],
            jnp.asarray(pitches)[None],
            jax.random.PRNGKey(seed),
        )
        wav = np.asarray(wav[0])[: len(audio)]

        # amplitude renorm (reference inference.py:75-84)
        in_peak = np.abs(audio).max() + 1e-8
        out_peak = np.abs(wav).max() + 1e-8
        return wav * (in_peak / out_peak)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--speaker", type=int, default=0)
    parser.add_argument("--pitch-adjust", type=float, default=0)
    args = parser.parse_args()

    from fish_diffusion_tpu.utils.audio import load_wav, save_wav
    from fish_diffusion_tpu.utils.audio import slice_audio

    engine = HiFiSingerInference(args.config, args.checkpoint)

    audio, sr = load_wav(args.input)
    if sr != engine.sampling_rate:
        from fish_diffusion_tpu.extractors.feature import resample_linear

        audio = resample_linear(audio, sr, engine.sampling_rate)

    generated = np.zeros_like(audio)
    for start, end in slice_audio(audio, engine.sampling_rate):
        out = engine.forward(
            audio[start:end], args.speaker, args.pitch_adjust
        )
        generated[start : start + len(out)] = out[: end - start]

    save_wav(args.output, generated, engine.sampling_rate)
    print(f"[hifisinger] wrote {args.output}")


if __name__ == "__main__":
    main()
