"""WenetSpeech cleaner (parity with the reference
``tools/tts/batch/clean_wenet_speech.py``): for each source recording,
optionally isolate vocals (htdemucs, gated — needs local demucs weights),
then cut confidence>0.95 transcript segments into ``S#####.wav`` + sidecar
``.txt`` files under ``cleaned/<aid>/`` with a ``done`` marker for resume.

SLURM-style sharding: rank = SLURM_PROCID, world = SLURM_NTASKS (same env
contract as the reference; works with tools/tts/batch/launch.py).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from fish_diffusion_tpu.utils.audio import load_wav, save_wav  # noqa: E402


def decode_to_wav(src: Path, rate: int) -> "tuple":
    """ffmpeg-decode any container to mono float wav at ``rate``."""
    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        subprocess.check_call(
            ["ffmpeg", "-y", "-i", str(src), "-c:a", "pcm_s16le",
             "-ac", "1", "-threads", "0", "-ar", str(rate), f.name],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return load_wav(f.name)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--dataset", default="dataset/tts/WenetSpeech",
        help="WenetSpeech root (holds WenetSpeech.json)",
    )
    parser.add_argument("--rate", type=int, default=24000)
    parser.add_argument("--min-confidence", type=float, default=0.95)
    parser.add_argument(
        "--separate-vocals", action="store_true",
        help="run htdemucs vocal isolation first (needs demucs weights)",
    )
    args = parser.parse_args()

    rank = int(os.environ.get("SLURM_PROCID", 0))
    world_size = int(os.environ.get("SLURM_NTASKS", 1))
    print(f"Rank {rank}/{world_size}")

    dataset_path = Path(args.dataset)
    cleaned_path = dataset_path / "cleaned"
    cleaned_path.mkdir(parents=True, exist_ok=True)

    with open(dataset_path / "WenetSpeech.json") as f:
        dataset = json.load(f)["audios"]
    dataset = dataset[rank::world_size]
    print(f"{len(dataset)} recordings on this rank")

    for data_idx, data in enumerate(dataset):
        done_path = cleaned_path / data["aid"] / "done"
        done_path.parent.mkdir(parents=True, exist_ok=True)
        if done_path.exists():
            continue

        print(f"Processing {data_idx}/{len(dataset)} at rank {rank}")
        try:
            vocals, sr = decode_to_wav(dataset_path / data["path"], args.rate)

            if args.separate_vocals:
                from fish_diffusion_tpu.utils.audio import separate_vocals

                vocals, _ = separate_vocals(vocals, sr)

            for idx, segment in enumerate(data["segments"]):
                if segment["confidence"] <= args.min_confidence:
                    continue
                begin = int(segment["begin_time"] * sr)
                end = int(segment["end_time"] * sr)
                out = cleaned_path / data["aid"] / f"S{idx:05d}.wav"
                save_wav(out, vocals[begin:end], sr)
                out.with_suffix(".txt").write_text(segment["text"])

            done_path.write_text("")
        except Exception as e:
            print(f"Error {e} on {data_idx}/{len(dataset)} at rank {rank}")
            time.sleep(10)


if __name__ == "__main__":
    main()
