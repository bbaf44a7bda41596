"""Pack a directory of preprocessing artifacts (one pickled ``.npy`` dict per
sample, the ``extract_features.py`` output contract) into a single ``.fpk``
file for the native parallel loader (``fish_diffusion_tpu/datasets/datapack.py``).

Usage:
    python tools/preprocessing/pack_dataset.py --input dataset/train \
        --output dataset/train.fpk
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="directory of .npy dicts")
    parser.add_argument("--output", required=True, help="output .fpk path")
    args = parser.parse_args()

    from fish_diffusion_tpu.datasets import PackedReader, pack_dataset

    t0 = time.perf_counter()
    n = pack_dataset(args.input, args.output)
    size = Path(args.output).stat().st_size
    print(
        f"packed {n} samples -> {args.output} "
        f"({size / 2**20:.1f} MB, {time.perf_counter() - t0:.1f}s)"
    )

    # verify the pack opens and the first/last samples decode
    reader = PackedReader(args.output)
    assert len(reader) == n
    for i in (0, n - 1):
        sample = reader.read(i)
        assert any(hasattr(v, "shape") for v in sample.values())
    reader.close()
    print("verified: pack opens and samples decode")


if __name__ == "__main__":
    main()
