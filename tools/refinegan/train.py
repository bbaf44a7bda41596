"""RefineGAN vocoder training CLI (parity with reference
``tools/refinegan/train.py``: MPD+MRD adversarial + multi-scale mel +
envelope losses, NaiveVOCODERDataset with pitch/loudness augmentation)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--log-dir", type=str, default="logs/refinegan")
    args = parser.parse_args()

    from fish_diffusion_tpu.config import Config
    from fish_diffusion_tpu.datasets import DataLoader
    from fish_diffusion_tpu.registry import DATASETS
    from fish_diffusion_tpu.training.vocoder_trainer import VocoderTrainer

    from fish_diffusion_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()

    cfg = Config.fromfile(args.config)

    dataset = DATASETS.build(dict(cfg.dataset.train))
    loader = DataLoader(
        dataset, collate_fn=dataset.collate_fn, **dict(cfg.dataloader.train)
    )

    # GAN schedulers decay once per EPOCH (reference tools/refinegan/train.py
    # steps scheduler_g/d on is_last_batch)
    trainer = VocoderTrainer(
        cfg, log_dir=args.log_dir, steps_per_epoch=max(len(loader), 1)
    )

    valid_loader = None
    if cfg.dataset.get("valid"):
        try:
            valid_dataset = DATASETS.build(dict(cfg.dataset.valid))
            valid_loader = DataLoader(
                valid_dataset,
                collate_fn=valid_dataset.collate_fn,
                **dict(cfg.dataloader.valid),
            )
        except AssertionError:
            pass

    trainer.fit(loader, resume=args.resume, valid_loader=valid_loader)


if __name__ == "__main__":
    main()
