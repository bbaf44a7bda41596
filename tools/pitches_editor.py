"""Pitch curve extract/plot/edit CLI (parity with reference
``tools/pitches_editor.py``: click CLI with extract/plot/edit commands;
argparse subcommands here)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def extract(args):
    from fish_diffusion_tpu.registry import PITCH_EXTRACTORS
    from fish_diffusion_tpu.utils.audio import load_wav
    import fish_diffusion_tpu.extractors  # noqa: F401

    audio, sr = load_wav(args.input)
    ext = PITCH_EXTRACTORS.build(
        {"type": args.extractor, "keep_zeros": args.keep_zeros}
    )
    f0 = np.asarray(ext(audio, sr, pad_to=len(audio) // args.hop_length))

    out = Path(args.output or Path(args.input).with_suffix(".pitch.json"))
    out.write_text(json.dumps({"sampling_rate": sr, "hop_length": args.hop_length,
                               "pitches": f0.tolist()}))
    print(f"extracted {len(f0)} frames -> {out}")


def plot(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = json.loads(Path(args.input).read_text())
    f0 = np.asarray(data["pitches"])
    t = np.arange(len(f0)) * data["hop_length"] / data["sampling_rate"]

    fig, ax = plt.subplots(figsize=(14, 4))
    ax.plot(t[f0 > 0], f0[f0 > 0], ".", markersize=2)
    ax.set_xlabel("time (s)")
    ax.set_ylabel("f0 (Hz)")
    out = args.output or Path(args.input).with_suffix(".png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"plotted -> {out}")


def edit(args):
    data = json.loads(Path(args.input).read_text())
    f0 = np.asarray(data["pitches"], np.float64)

    if args.shift:
        f0 = np.where(f0 > 0, f0 * 2 ** (args.shift / 12), f0)
    if args.scale:
        f0 = np.where(f0 > 0, f0 * args.scale, f0)
    if args.clip_min or args.clip_max:
        lo = args.clip_min or 0
        hi = args.clip_max or 1e9
        f0 = np.where(f0 > 0, np.clip(f0, lo, hi), f0)

    data["pitches"] = f0.tolist()
    out = args.output or args.input
    Path(out).write_text(json.dumps(data))
    print(f"edited -> {out}")


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract")
    p.add_argument("--input", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--extractor", default="ParselMouthPitchExtractor")
    p.add_argument("--hop-length", type=int, default=512)
    p.add_argument("--keep-zeros", action="store_true")
    p.set_defaults(fn=extract)

    p = sub.add_parser("plot")
    p.add_argument("--input", required=True)
    p.add_argument("--output", default=None)
    p.set_defaults(fn=plot)

    p = sub.add_parser("edit")
    p.add_argument("--input", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--shift", type=float, default=0, help="semitones")
    p.add_argument("--scale", type=float, default=0)
    p.add_argument("--clip-min", type=float, default=0)
    p.add_argument("--clip-max", type=float, default=0)
    p.set_defaults(fn=edit)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
