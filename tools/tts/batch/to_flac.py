"""Batch re-encode WAVs to FLAC in place via ffmpeg, deleting the originals
(parity with the reference ``tools/tts/batch/to_flac.py``)."""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
from multiprocessing import Pool, cpu_count
from pathlib import Path


def convert_one(src: Path) -> bool:
    dst = src.with_suffix(".flac")
    try:
        subprocess.check_call(
            ["ffmpeg", "-y", "-i", str(src), "-acodec", "flac",
             "-threads", "0", str(dst)],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        src.unlink()
        return True
    except subprocess.CalledProcessError:
        print(f"failed: {src}", file=sys.stderr)
        return False


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="directory of wavs")
    parser.add_argument("--workers", type=int, default=cpu_count())
    args = parser.parse_args()

    if shutil.which("ffmpeg") is None:
        print("ffmpeg is not installed; install it to use this tool",
              file=sys.stderr)
        sys.exit(1)

    wavs = sorted(Path(args.input).rglob("*.wav"))
    print(f"{len(wavs)} files")
    with Pool(args.workers) as pool:
        ok = sum(pool.map(convert_one, wavs))
    print(f"converted {ok}/{len(wavs)}")


if __name__ == "__main__":
    main()
