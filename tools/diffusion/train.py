"""Diffusion SVC/SVS/TTS training CLI.

Capability parity with the reference ``tools/diffusion/train.py``:
--config / --resume / --pretrained / --only-train-speaker-embeddings /
--tensorboard(-only) flags, pretrained state surgery, then the trainer loop.

Usage:
    python tools/diffusion/train.py --config configs/svc_hubert_soft.py
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint dir to resume full state from")
    parser.add_argument("--pretrained", type=str, default=None,
                        help="checkpoint to warm-start params from (with surgery)")
    parser.add_argument("--only-train-speaker-embeddings", action="store_true")
    parser.add_argument("--log-dir", type=str, default="logs")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--wandb", action="store_true",
                        help="log to wandb (reference default logger; the "
                        "package must be installed)")
    parser.add_argument("--entity", type=str, default=None,
                        help="wandb entity (reference train.py:113)")
    parser.add_argument("--resume-id", action="store_true",
                        help="resume the run id stored in <log-dir>/run_id.txt "
                        "(reference train.py:115-117)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--profile", action="store_true",
                        help="write a jax.profiler trace of the first steps")
    args = parser.parse_args()

    import jax
    import numpy as np

    from fish_diffusion_tpu.config import Config
    from fish_diffusion_tpu.datasets import build_loader_from_config
    from fish_diffusion_tpu.training.trainer import Trainer

    np.random.seed(args.seed)

    # multi-node: join the cluster before any device access
    # (configs/svc_content_vec_multi_node.py; env-gated, no-op single-host)
    from fish_diffusion_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    if maybe_initialize_distributed():
        print(
            f"[train] multi-host: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.device_count()} global devices"
        )

    cfg = Config.fromfile(args.config)

    backend = None
    if args.wandb:
        from fish_diffusion_tpu.training.trainer import WandbExperimentLogger

        backend = WandbExperimentLogger(entity=args.entity)

    log_dir = Path(args.log_dir) / (args.name or Path(args.config).stem)
    trainer = Trainer(
        cfg,
        log_dir=str(log_dir),
        logger_backend=backend,
        run_name=args.name,
        resume_run=args.resume_id or bool(args.resume),
    )

    n_devices = trainer.n_devices
    print(f"[train] mesh: {trainer.mesh}; devices: {n_devices}")

    train_loader, valid_loader = build_loader_from_config(cfg, n_devices)

    if args.only_train_speaker_embeddings:
        # freeze everything except speaker embeddings
        # (reference train.py:99-106) via optax.masked zero-updates
        import optax

        from fish_diffusion_tpu.training.optim import build_optimizer

        def speaker_mask(params):
            def mask_fn(path, _):
                return any("speaker_encoder" in str(p) for p in path)

            return jax.tree_util.tree_map_with_path(mask_fn, params)

        base_tx = trainer.optimizer
        trainer.optimizer = optax.chain(
            optax.masked(base_tx, speaker_mask),
        )
        from fish_diffusion_tpu.training.state import make_train_step

        trainer._train_step = make_train_step(
            trainer.model, trainer.optimizer, trainer.ema_momentum, trainer.mesh
        )
        print("[train] only training speaker embeddings")

    if args.pretrained:
        import pickle

        batch = next(iter(train_loader))
        state = trainer.init_state(batch, args.seed)
        with open(args.pretrained, "rb") as f:
            pretrained = pickle.load(f)
        state = trainer.load_pretrained(state, pretrained)
        trainer.ckpt.save(state)  # persist surgically-initialized state
        print(f"[train] warm-started from {args.pretrained}")

    if args.profile:
        from fish_diffusion_tpu.utils.profiling import profile_trace

        trainer.max_steps = min(trainer.max_steps, 50)
        with profile_trace(str(log_dir / "profile")):
            trainer.fit(train_loader, valid_loader, seed=args.seed)
        return

    trainer.fit(
        train_loader,
        valid_loader,
        resume=args.resume is not None or args.pretrained is not None,
        seed=args.seed,
    )


if __name__ == "__main__":
    main()
