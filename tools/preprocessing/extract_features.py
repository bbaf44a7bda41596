"""Offline feature extraction: dataset -> one .npy dict per (file, aug).

Capability parity with the reference
``tools/preprocessing/extract_features.py``:
- per-file loudness normalization, optional time stretch
- mel via the vocoder's transform, content features, pitch (x 2^(shift/12)),
  energy
- augmentations Fixed/RandomPitchShifting, RandomTimeStretching,
  RandomLoudness with probability>1 meaning multiple draws (:175-212)
- idempotent: skips existing .npy; per-file error isolation (safe_process)
- multi-worker sharding by ``--rank/--world-size`` file striding (:320-322)

TPU-native difference: no per-worker GPU pinning / subprocess fan-out — the
extractors are jitted JAX programs on the one accelerator; multi-host runs
shard the file list with the same rank/world-size flags.
"""

from __future__ import annotations

import argparse
import random
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

AUDIO_EXTS = {".wav"}


def loudness_norm(audio: np.ndarray, target_db: float = -23.0) -> np.ndarray:
    """RMS-based loudness normalization (stand-in for ITU-R BS.1770 — the
    reference uses fish_audio_preprocess/pyloudnorm, not in this image)."""
    rms = np.sqrt(np.mean(audio**2) + 1e-12)
    gain = 10 ** (target_db / 20) / (rms + 1e-12)
    return np.clip(audio * gain, -1.0, 1.0)


def time_stretch(audio: np.ndarray, ratio: float) -> np.ndarray:
    """Resample-based stretch (changes duration AND pitch together; the
    matching pitch is recomputed from the stretched audio)."""
    new_len = int(round(len(audio) / ratio))
    return np.interp(
        np.linspace(0, len(audio) - 1, new_len), np.arange(len(audio)), audio
    ).astype(np.float32)


class FeaturePipeline:
    def __init__(self, config):
        from fish_diffusion_tpu.ops.mel import LogMelSpectrogram
        from fish_diffusion_tpu.registry import (
            ENERGY_EXTRACTORS,
            FEATURE_EXTRACTORS,
            PITCH_EXTRACTORS,
        )
        import fish_diffusion_tpu.extractors  # noqa: F401

        self.config = config
        pre = config.preprocessing

        self.text_features_extractor = None
        if pre.get("text_features_extractor"):
            self.text_features_extractor = FEATURE_EXTRACTORS.build(
                dict(pre.text_features_extractor)
            )

        self.pitch_extractor = None
        if pre.get("pitch_extractor"):
            self.pitch_extractor = PITCH_EXTRACTORS.build(
                dict(pre.pitch_extractor)
            )

        self.energy_extractor = None
        if pre.get("energy_extractor"):
            self.energy_extractor = ENERGY_EXTRACTORS.build(
                dict(pre.energy_extractor)
            )

        # audio length buckets (seconds): compile-once-per-bucket discipline
        self.bucket_seconds = (2, 5, 10, 15, 20, 30, 45, 60)

        voc = config.model.get("vocoder", {})
        self.sampling_rate = voc.get(
            "sampling_rate", config.get("sampling_rate", 44100)
        )
        self.hop_length = voc.get("hop_length", 512)
        self.mel_transform = LogMelSpectrogram(
            sample_rate=self.sampling_rate,
            n_mels=voc.get("mel_channels", 128),
            hop_length=self.hop_length,
            use_natural_log=voc.get("use_natural_log", True),
        )

    def _bucket_samples(self, n: int) -> int:
        for sec in self.bucket_seconds:
            b = sec * self.sampling_rate
            if n <= b:
                return b
        return int(np.ceil(n / self.sampling_rate)) * self.sampling_rate

    def process(
        self,
        audio_path: Path,
        idx: int = 0,
        key_shift: float = 0.0,
        time_stretch_ratio: float = 1.0,
        loudness_ratio=None,
    ):
        from fish_diffusion_tpu.utils.audio import load_wav
        import jax.numpy as jnp

        save_path = audio_path.with_suffix(f".{idx}.data.npy")
        if save_path.exists():
            return False

        audio, sr = load_wav(audio_path)
        audio = resample_to(audio, sr, self.sampling_rate)
        audio = loudness_norm(audio)

        if loudness_ratio is not None:
            audio = audio * loudness_ratio
        if time_stretch_ratio != 1.0:
            audio = time_stretch(audio, time_stretch_ratio)

        # static-shape discipline: pad audio to a length bucket so the jitted
        # mel/pitch programs compile once per bucket, not once per file; the
        # true frame count is cropped back out
        mel_len = len(audio) // self.hop_length
        bucket_samples = self._bucket_samples(len(audio))
        audio_padded = np.pad(audio, (0, bucket_samples - len(audio)))

        mel = np.asarray(
            self.mel_transform.wav2spec(jnp.asarray(audio_padded)[None])
        )[0][:, :mel_len]  # [M, T]

        sample = {
            "path": str(audio_path),
            "sampling_rate": self.sampling_rate,
            "time_stretch": float(time_stretch_ratio),
            "key_shift": float(key_shift),
            "mel": mel.astype(np.float32),
            "audio": audio.astype(np.float32),
        }

        if self.text_features_extractor is not None:
            contents = self.text_features_extractor(
                audio_padded, self.sampling_rate
            )
            # crop the padded tail, then repeat-expand to mel frames
            # (numpy: per-file unique shapes would eagerly dispatch tiny
            # device ops once per file — seconds each over a remote tunnel)
            from fish_diffusion_tpu.ops.tensor import repeat_expand_np

            t_feat = contents.shape[-1]
            t_true = max(int(round(t_feat * len(audio) / bucket_samples)), 1)
            contents = repeat_expand_np(
                np.asarray(contents)[0, :, :t_true], mel_len
            )
            sample["contents"] = contents.astype(np.float32)

        if self.pitch_extractor is not None:
            pitches = self.pitch_extractor(
                audio_padded, self.sampling_rate, pad_to=None
            )
            n_frames_true = int(
                np.ceil(len(audio) / self.pitch_extractor.hop_length)
            )
            pitches = self.pitch_extractor.post_process(
                audio, self.sampling_rate,
                np.asarray(pitches)[:n_frames_true], mel_len,
            )
            pitches = np.asarray(pitches) * 2 ** (key_shift / 12)
            sample["pitches"] = pitches.astype(np.float32)

        if self.energy_extractor is not None:
            energy = self.energy_extractor(audio_padded, self.sampling_rate)
            n_frames_true = int(
                np.ceil(len(audio) / self.energy_extractor.hop_length)
            )
            from fish_diffusion_tpu.ops.tensor import repeat_expand_np

            energy = repeat_expand_np(
                np.asarray(energy)[:n_frames_true], mel_len
            )
            sample["energy"] = energy.astype(np.float32)

        np.save(save_path, sample, allow_pickle=True)
        return True


def resample_to(audio, sr, target_sr):
    from fish_diffusion_tpu.extractors.feature import resample_linear

    return resample_linear(audio, sr, target_sr)


def safe_process(pipeline, path, **kwargs):
    try:
        return pipeline.process(path, **kwargs)
    except Exception as e:
        print(f"[extract] error on {path}: {e}")
        return None


def build_augmentations(aug_configs):
    """reference :175-212: probability > 1 means floor(p) guaranteed draws
    plus one with probability frac(p)."""

    def draws(p):
        n = int(p)
        if random.random() < p - n:
            n += 1
        return n

    def sample_augs():
        jobs = []
        for cfg in aug_configs or []:
            for _ in range(draws(cfg.get("probability", 1.0))):
                kind = cfg["type"]
                if kind == "FixedPitchShifting":
                    jobs.append({"key_shift": random.choice(cfg["key_shifts"])})
                elif kind == "RandomPitchShifting":
                    lo, hi = cfg["key_shifts"]
                    jobs.append({"key_shift": random.uniform(lo, hi)})
                elif kind == "RandomTimeStretching":
                    lo, hi = cfg["factors"]
                    jobs.append({"time_stretch_ratio": random.uniform(lo, hi)})
                elif kind == "RandomLoudness":
                    lo, hi = cfg["loudnesses"]
                    jobs.append({"loudness_ratio": random.uniform(lo, hi)})
                else:
                    raise NotImplementedError(kind)
        return jobs

    return sample_augs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--path", type=str, required=True)
    parser.add_argument("--clean", action="store_true")
    parser.add_argument("--rank", type=int, default=0)
    parser.add_argument("--world-size", type=int, default=1)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument(
        "--num-workers",
        type=int,
        default=1,
        help="fan out N subprocesses with rank/world-size file sharding "
        "(reference extract_features.py:262-308; device pinning is per-host "
        "on TPU, so workers share the host CPU extractors)",
    )
    args = parser.parse_args()

    from fish_diffusion_tpu.config import Config

    random.seed(args.seed + args.rank)
    cfg = Config.fromfile(args.config)

    root = Path(args.path)
    if args.clean:
        for f in root.rglob("*.npy"):
            f.unlink()
        print("[extract] cleaned existing .npy files")

    # subprocess self-spawn (reference extract_features.py:262-308): the
    # parent becomes a supervisor; children re-run this CLI with
    # --rank/--world-size striding over the same file list
    if args.num_workers > 1 and args.world_size == 1:
        import subprocess
        import sys

        cmd_base = [
            sys.executable,
            str(Path(__file__).resolve()),
            "--config", args.config,
            "--path", args.path,
            "--seed", str(args.seed),
            "--world-size", str(args.num_workers),
        ]
        procs = [
            subprocess.Popen(cmd_base + ["--rank", str(rank)])
            for rank in range(args.num_workers)
        ]
        codes = [p.wait() for p in procs]
        failed = [r for r, c in enumerate(codes) if c != 0]
        if failed:
            raise SystemExit(f"[extract] worker ranks failed: {failed}")
        print(f"[extract] all {args.num_workers} workers done")
        return

    files = sorted(
        p for p in root.rglob("*") if p.suffix.lower() in AUDIO_EXTS
    )
    files = files[args.rank :: args.world_size]
    print(f"[extract] rank {args.rank}/{args.world_size}: {len(files)} files")

    pipeline = FeaturePipeline(cfg)
    sample_augs = build_augmentations(cfg.preprocessing.get("augmentations"))

    start = time.time()
    for i, path in enumerate(files):
        safe_process(pipeline, path, idx=0)
        for j, aug in enumerate(sample_augs()):
            safe_process(pipeline, path, idx=j + 1, **aug)

        if (i + 1) % 10 == 0:
            rate = (i + 1) / (time.time() - start)
            eta = (len(files) - i - 1) / max(rate, 1e-9)
            print(f"[extract] {i + 1}/{len(files)} ({rate:.2f} files/s, ETA {eta:.0f}s)")

    print(f"[extract] done in {time.time() - start:.1f}s")


if __name__ == "__main__":
    main()
