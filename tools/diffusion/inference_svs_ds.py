"""SVS inference from DiffSinger ``.ds`` score files.

Capability parity with the reference ``tools/diffusion/inference_svs_ds.py``:
- slur merging of the phoneme sequence (:86-100)
- f0 resampled from ``f0_timestep`` grid to mel frames (:103-125)
- phoneme features: [prev-phone one-hot | cur-phone one-hot | phone-start
  flag + duration] per frame (:128-156)
- per-chunk diffusion + vocoder, offset-placed into the output buffer
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def build_phoneme_features(phones, durations, n_mels, num_classes):
    """Frame-aligned phoneme feature matrix (reference :128-156)."""
    cumsum = np.cumsum(durations)
    alignment_factor = n_mels / cumsum[-1]

    features = np.zeros((n_mels, num_classes * 2 + 2), np.float32)
    for i, (phone, duration, sum_duration) in enumerate(
        zip(phones, durations, cumsum)
    ):
        current_idx = int(sum_duration * alignment_factor)
        previous_idx = int(cumsum[i - 1] * alignment_factor) if i > 0 else 0

        temp = np.zeros(num_classes * 2 + 1, np.float32)
        if i > 0:
            temp[phones[i - 1]] = 1
        temp[num_classes + phone] = 1
        temp[-1] = duration

        features[previous_idx:current_idx, : num_classes * 2 + 1] = temp
        features[previous_idx, -1] = 1  # phone start flag

    return features


def merge_slurs(ph_seq, ph_dur, is_slur_seq, phones_list):
    """Slur notes extend the previous phoneme (reference :86-100)."""
    phones, durations = [], []
    for phone, duration, is_slur in zip(
        ph_seq.split(" "), ph_dur.split(" "), is_slur_seq.split(" ")
    ):
        if is_slur == "1" and durations:
            durations[-1] += float(duration)
        else:
            phones.append(phones_list.index(phone))
            durations.append(float(duration))
    return np.array(phones), np.array(durations)


def inference(
    config,
    checkpoint,
    input_path,
    output_path,
    speaker_id: int = 0,
    sampler_interval=None,
):
    import jax
    import jax.numpy as jnp

    from fish_diffusion_tpu.inference.svc import SVCInference  # noqa: F401
    from fish_diffusion_tpu.models import build_model
    from fish_diffusion_tpu.ops.tensor import repeat_expand_np
    from fish_diffusion_tpu.registry import VOCODERS
    from fish_diffusion_tpu.utils.audio import save_wav

    sampling_rate = config.get("sampling_rate", 44100)
    hop_length = config.model.vocoder.get("hop_length", 512)
    phones_list = list(config.phonemes)
    num_classes = len(phones_list)

    model = build_model(config.model)

    import pickle

    with open(checkpoint, "rb") as f:
        state = pickle.load(f)
    params = (
        state.get("ema_params") or state.get("params")
        if isinstance(state, dict)
        else state
    )

    vocoder = VOCODERS.build(dict(config.model.vocoder))

    with open(input_path) as f:
        ds = json.load(f)

    total_samples = math.ceil(
        (
            float(ds[-1]["offset"])
            + float(ds[-1]["f0_timestep"]) * len(ds[-1]["f0_seq"].split(" "))
        )
        * sampling_rate
    )
    generated = np.zeros(total_samples, np.float32)

    for idx, chunk in enumerate(ds):
        offset = float(chunk["offset"])
        phones, durations = merge_slurs(
            chunk["ph_seq"], chunk["ph_dur"], chunk["is_slur_seq"], phones_list
        )

        f0_timestep = float(chunk["f0_timestep"])
        f0_seq = np.array([float(i) for i in chunk["f0_seq"].split(" ")])
        total_duration = f0_timestep * len(f0_seq)
        n_mels = round(total_duration * sampling_rate / hop_length)

        t_max = (len(f0_seq) - 1) * f0_timestep
        dt = hop_length / sampling_rate
        f0 = np.interp(
            np.arange(0, t_max, dt), f0_timestep * np.arange(len(f0_seq)), f0_seq
        ).astype(np.float32)
        f0 = repeat_expand_np(f0, n_mels, mode="linear")

        phoneme_features = build_phoneme_features(
            phones, durations, n_mels, num_classes
        )

        print(f"[svs] segment {idx + 1}/{len(ds)}: {total_duration:.2f}s")

        mel = model.apply(
            {"params": params},
            speakers=jnp.asarray([speaker_id], jnp.int32),
            contents=jnp.asarray(phoneme_features)[None],
            contents_lens=jnp.asarray([n_mels], jnp.int32),
            mel_lens=jnp.asarray([n_mels], jnp.int32),
            pitches=jnp.asarray(f0)[None],
            sampler_interval=sampler_interval,
            method=model.sample,
            rngs={"diffusion": jax.random.PRNGKey(idx)},
        )

        wav = np.asarray(vocoder.spec2wav(mel[0], jnp.asarray(f0)))

        start = round(offset * sampling_rate)
        max_len = len(generated) - start
        generated[start : start + len(wav)] = wav[:max_len]

    rms = np.sqrt(np.mean(generated**2) + 1e-12)
    generated = np.clip(generated * (10 ** (-23 / 20) / (rms + 1e-12)), -1, 1)
    save_wav(output_path, generated, sampling_rate)
    print("[svs] done")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--speaker_id", type=int, default=0)
    parser.add_argument("--sampler_interval", type=int, default=None)
    args = parser.parse_args()

    from fish_diffusion_tpu.config import Config

    cfg = Config.fromfile(args.config)
    inference(
        cfg,
        args.checkpoint,
        args.input,
        args.output,
        speaker_id=args.speaker_id,
        sampler_interval=args.sampler_interval,
    )


if __name__ == "__main__":
    main()
