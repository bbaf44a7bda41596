"""Train/valid split tool (parity with reference
``tools/preprocessing/random_move.py``): move a random N files from
train/ to valid/."""

from __future__ import annotations

import argparse
import random
import shutil
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", type=str, default="dataset/train")
    parser.add_argument("--target", type=str, default="dataset/valid")
    parser.add_argument("--num", type=int, default=10)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    random.seed(args.seed)
    source, target = Path(args.source), Path(args.target)
    target.mkdir(parents=True, exist_ok=True)

    files = sorted(p for p in source.rglob("*.wav"))
    chosen = random.sample(files, min(args.num, len(files)))

    for f in chosen:
        rel = f.relative_to(source)
        dest = target / rel
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.move(str(f), str(dest))
        # move sidecar files too (.npy features, .txt transcripts)
        for side in f.parent.glob(f.stem + ".*"):
            if side.suffix in (".npy", ".txt") and side.exists():
                shutil.move(str(side), str(dest.parent / side.name))

    print(f"moved {len(chosen)} files {source} -> {target}")


if __name__ == "__main__":
    main()
