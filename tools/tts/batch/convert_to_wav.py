"""Batch convert an audio tree to 16-bit PCM WAV via ffmpeg (parity with the
reference ``tools/tts/batch/convert_to_wav.py``: ffmpeg pcm_s16le @ 24 kHz,
multiprocessing pool, resumable — existing outputs skipped)."""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
from multiprocessing import Pool, cpu_count
from pathlib import Path

SUFFIXES = {".mp3", ".flac", ".ogg", ".opus", ".m4a", ".wav", ".aac"}


def convert_one(job):
    src, dst, rate = job
    dst.parent.mkdir(parents=True, exist_ok=True)
    if dst.exists():
        return True
    try:
        subprocess.check_call(
            ["ffmpeg", "-y", "-i", str(src), "-c:a", "pcm_s16le",
             "-threads", "0", "-ar", str(rate), str(dst)],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return True
    except subprocess.CalledProcessError:
        print(f"failed: {src}", file=sys.stderr)
        return False


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--rate", type=int, default=24000)
    parser.add_argument("--workers", type=int, default=cpu_count())
    args = parser.parse_args()

    if shutil.which("ffmpeg") is None:
        print("ffmpeg is not installed; install it to use this tool",
              file=sys.stderr)
        sys.exit(1)

    src_dir, dst_dir = Path(args.input), Path(args.output)
    jobs = [
        (p, dst_dir / p.relative_to(src_dir).with_suffix(".wav"), args.rate)
        for p in sorted(src_dir.rglob("*"))
        if p.suffix.lower() in SUFFIXES
    ]
    print(f"{len(jobs)} files")
    with Pool(args.workers) as pool:
        ok = sum(pool.map(convert_one, jobs))
    print(f"converted {ok}/{len(jobs)}")


if __name__ == "__main__":
    main()
