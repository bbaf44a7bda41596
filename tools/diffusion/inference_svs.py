"""SVS inference from phoneme/duration/f0 JSON chunks.

Capability parity with the reference ``tools/diffusion/inference_svs.py``:
JSON "chunks" with phoneme sequences + durations + f0 curves -> phones
aligned at 20 ms -> ``AlignedWhisperForPhones`` features -> diffusion ->
vocoder; dictionary-built phone list with ``<PAD>/<EOS>/<UNK>/AP/SP``
prefix (:74-81).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def build_phone_list(dictionary_path):
    from fish_diffusion_tpu.utils.dictionary import load_dictionary

    _, phones = load_dictionary(dictionary_path, with_special_tokens=False)
    return ["<PAD>", "<EOS>", "<UNK>", "AP", "SP"] + phones


def align_phones(chunk, phones_list, frame_seconds: float = 0.02):
    """Phones + durations -> 20 ms aligned phone ids (reference :95-130)."""
    phones = chunk["phones"]
    durations = chunk["durations"]

    total = sum(durations)
    n_frames = int(round(total / frame_seconds))
    aligned = np.zeros(n_frames, np.int64)

    t = 0.0
    for phone, dur in zip(phones, durations):
        idx = (
            phones_list.index(phone)
            if phone in phones_list
            else phones_list.index("<UNK>")
        )
        s = int(round(t / frame_seconds))
        e = int(round((t + dur) / frame_seconds))
        aligned[s:e] = idx
        t += dur

    return aligned


def inference(config, checkpoint, input_path, output_path, speaker_id=0,
              dictionary_path="dictionaries/opencpop-strict.txt",
              sampler_interval=None):
    import jax
    import jax.numpy as jnp
    import pickle

    from fish_diffusion_tpu.models import build_model
    from fish_diffusion_tpu.ops.tensor import repeat_expand_np
    from fish_diffusion_tpu.registry import FEATURE_EXTRACTORS, VOCODERS
    from fish_diffusion_tpu.utils.audio import save_wav
    import fish_diffusion_tpu.extractors  # noqa: F401

    sampling_rate = config.get("sampling_rate", 44100)
    hop_length = config.model.vocoder.get("hop_length", 512)

    phones_list = build_phone_list(dictionary_path)

    model = build_model(config.model)
    with open(checkpoint, "rb") as f:
        state = pickle.load(f)
    params = (
        state.get("ema_params") or state.get("params")
        if isinstance(state, dict)
        else state
    )

    phones_extractor = FEATURE_EXTRACTORS.build(
        dict(config.preprocessing.text_features_extractor)
    )
    vocoder = VOCODERS.build(dict(config.model.vocoder))

    with open(input_path) as f:
        chunks = json.load(f)

    total_seconds = max(
        float(c.get("offset", 0)) + sum(c["durations"]) for c in chunks
    )
    generated = np.zeros(int(np.ceil(total_seconds * sampling_rate)), np.float32)

    for idx, chunk in enumerate(chunks):
        offset = float(chunk.get("offset", 0))
        aligned = align_phones(chunk, phones_list)

        f0_timestep = float(chunk.get("f0_timestep", 0.02))
        f0_seq = np.asarray(chunk["f0"], np.float32)

        total_duration = sum(chunk["durations"])
        n_mels = int(round(total_duration * sampling_rate / hop_length))

        # resample f0 to mel frames
        t_grid = np.arange(n_mels) * hop_length / sampling_rate
        f0 = np.interp(
            t_grid, f0_timestep * np.arange(len(f0_seq)), f0_seq
        ).astype(np.float32)

        features = phones_extractor(aligned)  # [1, C, T_phones]
        contents = repeat_expand_np(np.asarray(features)[0], n_mels).T  # [n_mels, C]

        print(f"[svs] chunk {idx + 1}/{len(chunks)}: {total_duration:.2f}s")

        mel = model.apply(
            {"params": params},
            speakers=jnp.asarray([speaker_id], jnp.int32),
            contents=jnp.asarray(contents)[None],
            contents_lens=jnp.asarray([n_mels], jnp.int32),
            mel_lens=jnp.asarray([n_mels], jnp.int32),
            pitches=jnp.asarray(f0)[None],
            sampler_interval=sampler_interval,
            method=model.sample,
            rngs={"diffusion": jax.random.PRNGKey(idx)},
        )

        wav = np.asarray(vocoder.spec2wav(mel[0], jnp.asarray(f0)))
        start = int(round(offset * sampling_rate))
        end = min(start + len(wav), len(generated))
        generated[start:end] = wav[: end - start]

    save_wav(output_path, generated, sampling_rate)
    print(f"[svs] wrote {output_path}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--speaker_id", type=int, default=0)
    parser.add_argument("--dictionary", default="dictionaries/opencpop-strict.txt")
    parser.add_argument("--sampler_interval", type=int, default=None)
    args = parser.parse_args()

    from fish_diffusion_tpu.config import Config

    inference(
        Config.fromfile(args.config),
        args.checkpoint,
        args.input,
        args.output,
        speaker_id=args.speaker_id,
        dictionary_path=args.dictionary,
        sampler_interval=args.sampler_interval,
    )


if __name__ == "__main__":
    main()
