"""Drive the TTS regime (GradTTS + LlamaDenoiser) end-to-end on hardware.

The diffusion-SVC and GAN regimes have committed hardware proof artifacts
(docs/artifacts/soak_*.json, gan_run_*.json, vocoder_run_*.json); this
script provides the same evidence for the third training regime: the
token-conditioned transformer denoiser (reference ``configs/tts_baseline.py``
= GradTTS arch + LlamaDenoiser, trained by ``tools/diffusion/train.py``).

Synthetic-but-learnable TTS data: each of 64 "phone" tokens owns a fixed
random 128-d mel template; a clip's mel is its token templates held for 4
frames each, smoothed over time, plus small noise. The model must learn
token-conditioned denoising, so train/valid losses fall iff conditioning
works through the causal token-prefix attention.

Runs the REAL stack: .npy dataset dir -> NaiveTTSDataset ->
build_loader_from_config -> Trainer.fit (async feeder, validation,
checkpointing).

Usage (single TPU chip; serialize with other TPU users):
    python tools/tts/prove_tts_training.py --steps 2000 \
        --out docs/artifacts/tts_run_r03.json
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

ROOT = Path(__file__).resolve().parents[2]

VOCAB_USED = 64
FRAMES_PER_TOKEN = 4
N_TOKENS = 96  # -> 384 mel frames per clip (one static shape)


def make_dataset(root: Path, n_train=160, n_valid=8, seed=0):
    rng = np.random.default_rng(seed)
    # token -> mel-template map shared by both splits (the learnable signal)
    templates = rng.uniform(-4.5, -0.5, size=(VOCAB_USED, 128)).astype(
        np.float32
    )
    kernel = np.hanning(9).astype(np.float32)
    kernel /= kernel.sum()
    for split, n in [("train", n_train), ("valid", n_valid)]:
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            tokens = rng.integers(0, VOCAB_USED, size=N_TOKENS)
            mel = np.repeat(
                templates[tokens], FRAMES_PER_TOKEN, axis=0
            )  # [T, 128]
            mel = np.apply_along_axis(
                lambda r: np.convolve(r, kernel, mode="same"), 0, mel
            )
            mel = np.clip(
                mel + 0.05 * rng.standard_normal(mel.shape), -5.0, 0.0
            ).astype(np.float32)
            np.save(
                d / f"{i:04d}.npy",
                dict(
                    path=f"tts_{i}.wav",
                    mel=mel.T,  # stored [128, T] like the real pipeline
                    contents=tokens.astype(np.int64),
                ),
                allow_pickle=True,
            )
    return root


def write_config(root: Path, data_root: Path) -> Path:
    cfg_file = root / "tts_proof_cfg.py"
    cfg_file.write_text(
        f"""
_base_ = ["{ROOT}/configs/tts_baseline.py"]

dataset = dict(
    train=dict(path="{data_root}/train"),
    valid=dict(path="{data_root}/valid"),
)
dataloader = dict(
    train=dict(batch_size=8, shuffle=True, num_workers=1),
    valid=dict(batch_size=8, shuffle=False, num_workers=1),
)
trainer = dict(
    accumulate_grad_batches=1,
    transfer_dtype="float16",
    limit_val_batches=1,
)
"""
    )
    return cfg_file


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--val-interval", type=int, default=500)
    parser.add_argument(
        "--ckpt-interval", type=int, default=1000,
        help="checkpoint thinning (trainer.checkpoint.every_n_train_steps); "
        "saves run async so they overlap training",
    )
    parser.add_argument("--log-dir", default="logs/tts_proof_r04")
    parser.add_argument("--data-dir", default="/tmp/tts_proof_data")
    parser.add_argument("--out", default="docs/artifacts/tts_run_r04.json")
    parser.add_argument("--cache", action="store_true",
                        help="trainer.cache_batches_on_device")
    parser.add_argument("--val-sampler-interval", type=int, default=50,
                        help="coarser reverse diffusion at validation "
                        "(trainer.val_sampler_interval): 50 -> 20 denoiser "
                        "evals instead of 100, cutting validation wall cost")
    parser.add_argument("--tiny", action="store_true",
                        help="shrink the denoiser (CPU smoke test)")
    args = parser.parse_args()

    import jax

    from fish_diffusion_tpu.config import Config
    from fish_diffusion_tpu.datasets.loader import build_loader_from_config
    from fish_diffusion_tpu.training.trainer import Trainer

    log_dir = Path(args.log_dir)
    if log_dir.exists():
        shutil.rmtree(log_dir)

    data_root = make_dataset(Path(args.data_dir))
    cfg_file = write_config(Path(args.data_dir), data_root)

    cfg = Config.fromfile(str(cfg_file))
    cfg.trainer["max_steps"] = args.steps
    cfg.trainer["val_check_interval"] = args.val_interval
    cfg.trainer["log_every_n_steps"] = 25
    cfg.trainer["checkpoint"] = dict(
        every_n_train_steps=args.ckpt_interval
    )
    cfg.trainer["val_sampler_interval"] = args.val_sampler_interval
    if args.cache:
        cfg.trainer["cache_batches_on_device"] = True

    n_params_note = (
        "LlamaDenoiser full tts_baseline size: hidden 768 x 24 layers"
    )
    if args.tiny:
        cfg.model.diffusion.denoiser.update(
            hidden_size=64, intermediate_size=128, num_attention_heads=4,
            num_hidden_layers=2, vocab_size=256,
        )
        cfg.model.diffusion["timesteps"] = 32
        n_params_note = "tiny smoke-test size"

    print(f"[tts-proof] platform={jax.devices()[0].platform}", flush=True)

    trainer = Trainer(cfg, log_dir=str(log_dir))
    train_loader, valid_loader = build_loader_from_config(
        cfg, trainer.n_devices
    )

    t0 = time.perf_counter()
    state = trainer.fit(train_loader, valid_loader, seed=42)
    wall = time.perf_counter() - t0
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )

    rows = [
        json.loads(l) for l in open(log_dir / "metrics.jsonl")
    ]
    train_rows = [r for r in rows if "train_loss" in r]
    val_rows = [r for r in rows if "valid_loss" in r]
    steps_arr = np.array([r["step"] for r in train_rows], dtype=float)
    times_arr = np.array([r["time"] for r in train_rows], dtype=float)
    dt = np.diff(times_arr)
    keep = np.diff(steps_arr) > 0
    if keep.any():
        keep &= dt <= 10.0 * float(np.median(dt[keep]))
    sps = (np.diff(steps_arr)[keep] / dt[keep]).tolist()

    fifth = max(len(train_rows) // 5, 1)
    summary = {
        "config": "configs/tts_baseline.py (GradTTS + LlamaDenoiser)",
        "model": n_params_note,
        "platform": jax.devices()[0].platform,
        "params": int(n_params),
        "steps": int(state.step),
        "batch": 8,
        "mel_frames": N_TOKENS * FRAMES_PER_TOKEN,
        "cache_batches_on_device": bool(args.cache),
        "wall_seconds": wall,
        "wall_breakdown": getattr(trainer, "last_wall_breakdown", None),
        "val_sampler_interval": args.val_sampler_interval,
        "ckpt_every_n_train_steps": args.ckpt_interval,
        "steps_per_sec_wall": int(state.step) / wall,
        "steps_per_sec_median": float(np.median(sps)) if sps else None,
        "train_loss_first_fifth": float(
            np.mean([r["train_loss"] for r in train_rows[:fifth]])
        ),
        "train_loss_last_fifth": float(
            np.mean([r["train_loss"] for r in train_rows[-fifth:]])
        ),
        "val_series": [
            {"step": r["step"], "valid_loss": r["valid_loss"]}
            for r in val_rows
        ],
        "feeder_stats": getattr(trainer, "last_feeder_stats", {}),
        "ckpt_stats": dict(trainer.ckpt.stats),
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(summary, indent=1))
    sps_med = summary["steps_per_sec_median"]
    print(
        f"[tts-proof] {summary['steps']} steps in {wall / 60:.1f} min "
        f"({sps_med:.2f} steps/s median), " if sps_med is not None else
        f"[tts-proof] {summary['steps']} steps in {wall / 60:.1f} min "
        f"(too few log rows for a rate), ",
        end="",
        flush=True,
    )
    print(
        f"train {summary['train_loss_first_fifth']:.4f}->"
        f"{summary['train_loss_last_fifth']:.4f}, "
        f"{len(val_rows)} validations; wrote {out}",
        flush=True,
    )


if __name__ == "__main__":
    main()
