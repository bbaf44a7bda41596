"""Throughput vs cached-fraction sweep for the partial device-batch cache.

VERDICT r3 next #4: a corpus larger than the HBM byte budget must degrade
*gracefully* — throughput should interpolate between the fully-cached and
fully-streamed endpoints as ``trainer.cache_bytes_budget`` shrinks, not
cliff from 26 to 3.8 steps/s the moment one batch fails to fit.

This driver trains the flagship diffusion stack (WaveNet 20x512, the
soak_run corpus recipe) once per budget point on real hardware. Phase one
runs unbudgeted to learn the epoch's total device bytes, then each sweep
point sets ``cache_bytes_budget = fraction * total_bytes`` so the feeder
caches ~fraction of the epoch and streams the rest through the async
``DeviceFeeder`` (H2D overlapped with compute). Steady-state throughput is
measured from metrics.jsonl timestamps over epochs >= 2 only (epoch 1 is
the cache-building epoch in every mode, so it is excluded everywhere).

Replaces the all-or-nothing DataLoader semantics of the reference
(``/root/reference/fish_diffusion/datasets/naive.py:44-49``), whose GPU
train loop re-reads every batch from host RAM each epoch.

Usage (single TPU chip):
    python tools/diffusion/cache_sweep.py \
        --out docs/artifacts/partial_cache_r04.json
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


def run_point(cfg_file, log_dir, steps, val_interval, budget, smoke=False):
    """One fit() at a given byte budget; returns (stats, rate dict)."""
    from fish_diffusion_tpu.config import Config
    from fish_diffusion_tpu.datasets.loader import build_loader_from_config
    from fish_diffusion_tpu.training.trainer import Trainer

    cfg = Config.fromfile(str(cfg_file))
    if smoke:  # CPU pipeline check: shrink the denoiser, keep the plumbing
        cfg.model["diffusion"]["denoiser"]["residual_layers"] = 2
        cfg.model["diffusion"]["denoiser"]["residual_channels"] = 64
    cfg.trainer["max_steps"] = steps
    cfg.trainer["val_check_interval"] = val_interval
    cfg.trainer["log_every_n_steps"] = 20
    cfg.trainer["limit_val_batches"] = 2
    if budget is None:
        cfg.trainer["cache_batches_on_device"] = True
    else:
        cfg.trainer["cache_bytes_budget"] = int(budget)

    trainer = Trainer(cfg, log_dir=str(log_dir))
    train_loader, valid_loader = build_loader_from_config(cfg, trainer.n_devices)
    n_epoch_batches = len(train_loader)
    t0 = time.perf_counter()
    trainer.fit(train_loader, valid_loader, resume=False)
    wall = time.perf_counter() - t0
    stats = dict(getattr(trainer, "last_feeder_stats", {}))

    rows = [json.loads(l) for l in open(Path(log_dir) / "metrics.jsonl")]
    train_rows = [r for r in rows if "train_loss" in r]
    # steady state = epochs >= 2 (cache built; replay/stream regime active)
    steady = [r for r in train_rows if r["step"] > n_epoch_batches]
    steps_arr = np.array([r["step"] for r in steady], float)
    times_arr = np.array([r["time"] for r in steady], float)
    sps = (np.diff(steps_arr) / np.maximum(np.diff(times_arr), 1e-9)).tolist()
    return stats, {
        "wall_seconds": wall,
        "steady_steps_per_sec_median": float(np.median(sps)) if sps else None,
        "steady_steps_per_sec_p10": (
            float(np.percentile(sps, 10)) if sps else None
        ),
        "steady_steps_per_sec_p90": (
            float(np.percentile(sps, 90)) if sps else None
        ),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=500,
                        help="train steps per sweep point")
    parser.add_argument("--n-train", type=int, default=400,
                        help="corpus size (batch 20 -> n/20 batches/epoch)")
    parser.add_argument("--fractions", default="1.0,0.75,0.5,0.25,0.0")
    parser.add_argument("--log-dir", default="logs/cache_sweep_r04")
    parser.add_argument("--data-dir", default="/tmp/cache_sweep_data")
    parser.add_argument("--out", default="docs/artifacts/partial_cache_r04.json")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny CPU pipeline check (no timing value)")
    args = parser.parse_args()
    if args.smoke:
        args.steps, args.n_train = 24, 120
        args.fractions = "1.0,0.5,0.0"

    import jax

    import fish_diffusion_tpu  # noqa: F401  (honors JAX_PLATFORMS pre-init)
    from tools.diffusion.soak_run import make_dataset, write_config

    log_root = Path(args.log_dir)
    if log_root.exists():
        shutil.rmtree(log_root)
    data_root = make_dataset(Path(args.data_dir), n_train=args.n_train)
    cfg_file = write_config(Path(args.data_dir), data_root)
    print(f"[sweep] platform={jax.devices()[0].platform}", flush=True)

    # calibration: unbudgeted full cache -> epoch total bytes + top-end rate
    stats, rate = run_point(
        cfg_file, log_root / "full", args.steps, args.steps, budget=None,
        smoke=args.smoke,
    )
    total_bytes = int(stats.get("cache_bytes", 0))
    points = [
        {
            "requested_fraction": 1.0,
            "budget_bytes": None,
            "cached_fraction": stats.get("cached_fraction"),
            "cache_bytes": total_bytes,
            "streamed_batches": stats.get("streamed_batches"),
            "replayed_batches": stats.get("replayed_batches"),
            **rate,
        }
    ]
    print(f"[sweep] full cache: {total_bytes / 1e6:.0f} MB, "
          f"{rate['steady_steps_per_sec_median']} steps/s", flush=True)

    for frac in [float(f) for f in args.fractions.split(",") if float(f) < 1.0]:
        # +half a batch so quantization rounds to ~frac of the epoch
        n_batches = max(args.n_train // 20, 1)
        budget = int(total_bytes * frac + (total_bytes / n_batches) * 0.5)
        stats, rate = run_point(
            cfg_file,
            log_root / f"f{int(frac * 100):03d}",
            args.steps,
            args.steps,
            budget=budget,
            smoke=args.smoke,
        )
        points.append(
            {
                "requested_fraction": frac,
                "budget_bytes": budget,
                "cached_fraction": stats.get("cached_fraction"),
                "cache_bytes": stats.get("cache_bytes"),
                "streamed_batches": stats.get("streamed_batches"),
                "replayed_batches": stats.get("replayed_batches"),
                **rate,
            }
        )
        print(f"[sweep] frac={frac}: cached={stats.get('cached_fraction'):.2f} "
              f"{rate['steady_steps_per_sec_median']} steps/s", flush=True)

    summary = {
        "platform": jax.devices()[0].platform,
        "model": "svc_hubert_soft (WaveNet 20x512, full size)",
        "corpus_batches_per_epoch": args.n_train // 20,
        "epoch_device_bytes": total_bytes,
        "steps_per_point": args.steps,
        "transfer_dtype": "float16",
        "points": points,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(summary, indent=1))
    print(f"[sweep] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
