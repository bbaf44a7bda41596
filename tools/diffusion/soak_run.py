"""Long-duration soak of the flagship diffusion Trainer on real hardware.

VERDICT r2 next #9: prove the training loop at realistic duration — ≥30 min
of full-size (WaveNet 20x512) training through the REAL stack (``.npy``
dataset dir -> ``build_loader_from_config`` -> ``Trainer.fit`` with the
async feeder), with periodic validation + orbax checkpointing and a
genuine mid-run resume: phase 1 trains and exits, phase 2 constructs a
fresh ``Trainer`` and continues from the latest checkpoint
(reference trainer defaults ``configs/_base_/trainers/base.py:8-25``;
resume = ``trainer.fit(ckpt_path=...)``).

The dataset is synthetic but learnable: smooth random mel targets whose
``contents`` are a fixed random projection of the mel (same information
contract as HuBERT features), so train/valid losses must fall.

Usage (single TPU chip):
    python tools/diffusion/soak_run.py --steps1 20000 --steps2 50000 \
        --val-interval 10000 --out docs/artifacts/soak_run_r03.json
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


def make_dataset(root: Path, n_train=200, n_valid=8, seed=0):
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((256, 128)).astype(np.float32) / np.sqrt(128)
    for split, n in [("train", n_train), ("valid", n_valid)]:
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            t = int(rng.integers(400, 640))
            # smooth mel: random walk filtered over time
            mel = rng.standard_normal((128, t)).astype(np.float32)
            k = np.hanning(31)[None, :]
            mel = np.apply_along_axis(
                lambda r: np.convolve(r, k[0] / k.sum(), mode="same"), 1, mel
            ).astype(np.float32)
            mel = -2.5 + 2.0 * mel / (np.abs(mel).max() + 1e-6)
            contents = (proj @ mel + 0.05 * rng.standard_normal((256, t))).astype(
                np.float32
            )
            np.save(
                d / f"{i:04d}.npy",
                dict(
                    path=f"s{i}.wav",
                    time_stretch=1.0,
                    key_shift=0.0,
                    mel=mel,
                    contents=contents,
                    pitches=rng.uniform(80, 400, t).astype(np.float32),
                ),
                allow_pickle=True,
            )
    return root


def write_config(root: Path, data_root: Path) -> Path:
    cfg_file = root / "soak_cfg.py"
    cfg_file.write_text(
        f"""
_base_ = ["{ROOT}/configs/svc_hubert_soft.py"]

dataset = dict(
    train=dict(path="{data_root}/train"),
    valid=dict(path="{data_root}/valid"),
)
dataloader = dict(
    train=dict(batch_size=20, shuffle=True, num_workers=1),
    valid=dict(batch_size=4, shuffle=False, num_workers=1),
)
# halve H2D bytes: the dev tunnel (~50 MB/s) is the bottleneck for
# batch-20 diffusion batches (~20 MB); production links don't need this
trainer = dict(transfer_dtype="float16")
"""
    )
    return cfg_file


def run_phase(cfg, log_dir, max_steps, val_interval, resume, cache=False):
    """One fit() invocation; returns (state, wall_seconds, feeder_stats)."""
    from fish_diffusion_tpu.datasets.loader import build_loader_from_config
    from fish_diffusion_tpu.training.trainer import Trainer

    cfg.trainer["max_steps"] = max_steps
    cfg.trainer["val_check_interval"] = val_interval
    cfg.trainer["log_every_n_steps"] = 50
    cfg.trainer["limit_val_batches"] = 2
    if cache:
        cfg.trainer["cache_batches_on_device"] = True

    trainer = Trainer(cfg, log_dir=str(log_dir))
    train_loader, valid_loader = build_loader_from_config(
        cfg, trainer.n_devices
    )
    t0 = time.perf_counter()
    state = trainer.fit(train_loader, valid_loader, resume=resume)
    stats = getattr(trainer, "last_feeder_stats", {})
    return state, time.perf_counter() - t0, stats


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps1", type=int, default=4000)
    parser.add_argument("--steps2", type=int, default=9000)
    parser.add_argument("--val-interval", type=int, default=1500)
    parser.add_argument("--log-dir", default="logs/soak_r03")
    parser.add_argument("--data-dir", default="/tmp/soak_data")
    parser.add_argument("--out", default="docs/artifacts/soak_run_r03.json")
    parser.add_argument("--fresh", action="store_true",
                        help="wipe log dir (checkpoints + metrics) first")
    parser.add_argument("--cache", action="store_true",
                        help="trainer.cache_batches_on_device: replay "
                        "epoch-1 HBM batches, zero steady-state H2D")
    args = parser.parse_args()

    import jax

    log_dir = Path(args.log_dir)
    if args.fresh and log_dir.exists():
        shutil.rmtree(log_dir)

    data_root = make_dataset(Path(args.data_dir))
    cfg_file = write_config(Path(args.data_dir), data_root)

    from fish_diffusion_tpu.config import Config

    print(f"[soak] platform={jax.devices()[0].platform}", flush=True)

    # rows already in metrics.jsonl (append-mode log) belong to previous
    # runs — remember the offset so the summary only reads this run's
    metrics_path = log_dir / "metrics.jsonl"
    n_preexisting = (
        sum(1 for _ in open(metrics_path)) if metrics_path.exists() else 0
    )

    # phase 1: cold start
    cfg = Config.fromfile(str(cfg_file))
    print(f"[soak] phase 1 -> step {args.steps1}", flush=True)
    state1, wall1, stats1 = run_phase(
        cfg, log_dir, args.steps1, args.val_interval, resume=False,
        cache=args.cache,
    )
    step1 = int(state1.step)
    print(f"[soak] phase 1 done at step {step1} in {wall1:.0f}s "
          f"feeder={stats1}", flush=True)
    del state1

    # phase 2: fresh Trainer object, resume from latest checkpoint
    cfg = Config.fromfile(str(cfg_file))
    print(f"[soak] phase 2 (RESUME) -> step {args.steps2}", flush=True)
    state2, wall2, stats2 = run_phase(
        cfg, log_dir, args.steps2, args.val_interval, resume=True,
        cache=args.cache,
    )
    step2 = int(state2.step)
    print(f"[soak] phase 2 done at step {step2} in {wall2:.0f}s "
          f"feeder={stats2}", flush=True)

    # summarize from the metrics log. NB: the logged ``steps_per_sec``
    # field is the host DISPATCH rate per interval — with the async feeder
    # the host runs ahead of the device and only syncs at validation
    # flushes, so per-interval values are meaningless (hundreds right
    # before a sync, tiny at the sync). True sustained throughput is
    # step-count over wall-clock between log timestamps.
    rows = [
        json.loads(l)
        for l in list(open(log_dir / "metrics.jsonl"))[n_preexisting:]
    ]
    train_rows = [r for r in rows if "train_loss" in r]
    val_rows = [r for r in rows if "valid_loss" in r]
    steps_arr = np.array([r["step"] for r in train_rows], dtype=float)
    times_arr = np.array([r["time"] for r in train_rows], dtype=float)
    dt = np.diff(times_arr)
    keep = np.diff(steps_arr) > 0  # resume restarts the step counter log
    if keep.any():
        # drop the phase-1 -> phase-2 boundary interval: its wall time
        # spans process restart + recompile, not training
        keep &= dt <= 10.0 * float(np.median(dt[keep]))
    sps = (np.diff(steps_arr)[keep] / dt[keep]).tolist()
    frames_per_step = 20 * 512  # batch x bucketed frames (approximate)

    summary = {
        "platform": jax.devices()[0].platform,
        "model": "svc_hubert_soft (WaveNet 20x512, full size)",
        "cache_batches_on_device": bool(args.cache),
        "feeder_stats_phase2": stats2,
        "phase1_steps": step1,
        "phase2_steps": step2,
        "resumed_at_step": step1,
        "wall_seconds_phase1": wall1,
        "wall_seconds_phase2": wall2,
        "wall_minutes_total": (wall1 + wall2) / 60,
        "steps_per_sec_median": float(np.median(sps)) if sps else None,
        "steps_per_sec_p10": float(np.percentile(sps, 10)) if sps else None,
        "steps_per_sec_p90": float(np.percentile(sps, 90)) if sps else None,
        "approx_mel_frames_per_sec": (
            float(np.median(sps)) * frames_per_step if sps else None
        ),
        "n_validations": len(val_rows),
        "val_series": [
            {"step": r["step"], "valid_loss": r["valid_loss"]} for r in val_rows
        ],
        "train_loss_first": train_rows[0]["train_loss"] if train_rows else None,
        "train_loss_last": train_rows[-1]["train_loss"] if train_rows else None,
        "steps_per_sec_series": [
            {
                "step": int(steps_arr[i + 1]),
                "steps_per_sec": float(
                    (steps_arr[i + 1] - steps_arr[i])
                    / max(times_arr[i + 1] - times_arr[i], 1e-9)
                ),
            }
            for i in range(len(steps_arr) - 1)
            if steps_arr[i + 1] > steps_arr[i]
        ][::4],
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(summary, indent=1))
    print(
        f"[soak] total {(wall1 + wall2) / 60:.1f} min, "
        f"{summary['steps_per_sec_median']:.2f} steps/s median, "
        f"{len(val_rows)} validations, resumed at {step1}; wrote {out}",
        flush=True,
    )


if __name__ == "__main__":
    main()
