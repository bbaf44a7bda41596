"""Colab/preemptible training wrapper (parity with reference
``tools/diffusion/colab_train.py``: sync logs/checkpoints to a persistent
drive directory with md5 dedupe, auto-resume from the highest step, then
exec train.py)."""

from __future__ import annotations

import argparse
import hashlib
import re
import shutil
import subprocess
import sys
from pathlib import Path


def md5(path: Path) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def sync(src: Path, dst: Path):
    """Copy new/changed files src -> dst (md5 dedupe)."""
    for f in src.rglob("*"):
        if not f.is_file():
            continue
        rel = f.relative_to(src)
        target = dst / rel
        target.parent.mkdir(parents=True, exist_ok=True)
        if target.exists() and md5(target) == md5(f):
            continue
        shutil.copy2(f, target)


def latest_step_dir(ckpt_root: Path):
    """Highest-numbered orbax step dir (reference colab_train.py:71-73)."""
    best, best_step = None, -1
    for d in ckpt_root.glob("*"):
        m = re.fullmatch(r"(\d+)", d.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = d, int(m.group(1))
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--drive-dir", required=True,
                        help="persistent dir (e.g. /content/drive/...)")
    parser.add_argument("--log-dir", default="logs")
    parser.add_argument("extra", nargs="*")
    args = parser.parse_args()

    drive = Path(args.drive_dir)
    local = Path(args.log_dir)
    drive.mkdir(parents=True, exist_ok=True)

    # restore persisted state
    if any(drive.iterdir()):
        print(f"[colab] restoring state from {drive}")
        sync(drive, local)

    cmd = [
        sys.executable,
        str(Path(__file__).parent / "train.py"),
        "--config", args.config,
        "--log-dir", str(local),
        *args.extra,
    ]
    ckpts = local / Path(args.config).stem / "checkpoints"
    if ckpts.exists() and latest_step_dir(ckpts) is not None:
        cmd += ["--resume", str(ckpts)]
        print(f"[colab] resuming from {latest_step_dir(ckpts)}")

    try:
        subprocess.run(cmd, check=False)
    finally:
        print(f"[colab] syncing state to {drive}")
        sync(local, drive)


if __name__ == "__main__":
    main()
