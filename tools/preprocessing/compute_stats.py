"""Compute dataset spec statistics (dataset/stats.json).

The v1 DiffSVC arch reads per-channel mel min/max from
``dataset/stats.json`` (reference ``diffusion.py:94-99`` via
``spec_stats_path``); this tool scans the preprocessed ``.npy`` dataset and
writes the file.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", default="dataset/train")
    parser.add_argument("--output", default="dataset/stats.json")
    parser.add_argument("--per-channel", action="store_true",
                        help="per-mel-channel stats instead of global scalars")
    args = parser.parse_args()

    files = sorted(Path(args.path).rglob("*.npy"))
    assert files, f"no .npy files under {args.path}"

    mins, maxs = [], []
    for f in files:
        sample = np.load(f, allow_pickle=True).item()
        mel = np.asarray(sample["mel"])  # [M, T]
        mins.append(mel.min(axis=1))
        maxs.append(mel.max(axis=1))

    mins = np.stack(mins).min(axis=0)
    maxs = np.stack(maxs).max(axis=0)

    if args.per_channel:
        stats = {"spec_min": mins.tolist(), "spec_max": maxs.tolist()}
    else:
        stats = {"spec_min": [float(mins.min())], "spec_max": [float(maxs.max())]}

    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps(stats))
    print(f"[stats] {len(files)} files -> {args.output}: "
          f"min {float(mins.min()):.3f}, max {float(maxs.max()):.3f}")


if __name__ == "__main__":
    main()
