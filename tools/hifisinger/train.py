"""HiFiSinger adversarial training CLI.

Capability parity with the reference ``tools/hifisinger/train.py``: picks the
V1 (NSF-HiFiGAN decoder, MPD+MSD) or V2 (RefineGAN decoder, MPD+MRD) regime
by ``cfg.model.encoder.type`` (:39-44), warm-start surgery via --pretrained,
then the jitted two-player SPMD loop.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--pretrained", type=str, default=None)
    parser.add_argument("--log-dir", type=str, default="logs/hifisinger")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fish_diffusion_tpu.config import Config
    from fish_diffusion_tpu.datasets import build_loader_from_config
    from fish_diffusion_tpu.models.hifisinger import HiFiSinger
    from fish_diffusion_tpu.parallel import make_mesh, shard_batch
    from fish_diffusion_tpu.training.checkpoint import CheckpointManager
    from fish_diffusion_tpu.training.gan import (
        Discriminators,
        create_gan_state,
        make_gan_train_step,
    )
    from fish_diffusion_tpu.training.optim import build_optimizer
    from fish_diffusion_tpu.training.trainer import MetricsLogger

    from fish_diffusion_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()

    cfg = Config.fromfile(args.config)
    mc = cfg.model

    flavor = "v2" if mc.encoder.get("type") == "RefineGAN" else "v1"
    print(f"[hifisinger] training regime: {flavor}")

    model_cfg = {
        k: v
        for k, v in dict(mc).items()
        if k not in ("type", "mpd", "mrd", "msd", "multi_scale_mels")
    }
    model = HiFiSinger(**model_cfg)

    hop = mc.encoder.get("hop_length", mc.encoder.get("hop_size", 512))
    sampling_rate = mc.encoder.get("sampling_rate", 44100)

    def generator_apply(params, batch, rng):
        pitches = batch["pitches"]
        if pitches.ndim == 3:
            pitches = pitches[:, :, 0]
        return model.apply(
            {"params": params},
            speakers=batch["speaker"],
            contents=batch["contents"],
            contents_lens=batch.get("contents_lens"),
            pitches=pitches,
            pitch_shift=batch.get("key_shift"),
            energy=batch.get("energy"),
            rngs={"noise": rng},
        )

    import jax.numpy as _jnp

    _ddt = str((cfg.get("trainer") or {}).get("discriminator_dtype", "float32"))
    discs = Discriminators(
        flavor,
        mpd_cfg=dict(mc.get("mpd", {})) or None,
        mrd_cfg=dict(mc.get("mrd", {})) or None,
        dtype=_jnp.bfloat16 if "bf" in _ddt else None,
    )

    mesh = make_mesh()
    n_devices = int(np.prod(mesh.devices.shape))
    train_loader, _ = build_loader_from_config(cfg, n_devices)

    # GAN schedulers decay once per EPOCH (reference hifisinger_v1.py:205-209)
    spe = max(len(train_loader), 1)
    tx_g = build_optimizer(dict(cfg.optimizer), dict(cfg.scheduler), steps_per_epoch=spe)
    tx_d = build_optimizer(dict(cfg.optimizer), dict(cfg.scheduler), steps_per_epoch=spe)

    step_fn = make_gan_train_step(
        generator_apply,
        discs,
        tx_g,
        tx_d,
        sampling_rate=sampling_rate,
        multi_scale_mels=tuple(
            tuple(s) for s in mc.get("multi_scale_mels", [(2048, hop, 2048)])
        ),
        mesh=mesh,
    )

    logger = MetricsLogger(args.log_dir)
    ckpt = CheckpointManager(Path(args.log_dir) / "checkpoints")
    max_steps = cfg.trainer.get("max_steps", 1_000_000)

    state = None
    rng = jax.random.PRNGKey(args.seed)
    t_last = time.perf_counter()

    def clean(batch):
        out = {}
        for k in ("audio", "contents", "contents_lens", "pitches", "speaker",
                  "key_shift", "energy"):
            if k in batch:
                v = jnp.asarray(batch[k])
                if k == "audio" and v.ndim == 3:
                    v = v[:, 0]
                out[k] = v
        return out

    while True:
        for batch in train_loader:
            b = clean(batch)
            if state is None:
                def gen_init():
                    return model.init(
                        {
                            "params": jax.random.PRNGKey(args.seed),
                            "noise": jax.random.PRNGKey(args.seed + 1),
                        },
                        speakers=b["speaker"][:1],
                        contents=b["contents"][:1],
                        contents_lens=b.get("contents_lens", None)[:1]
                        if b.get("contents_lens") is not None
                        else None,
                        pitches=b["pitches"][:1, :, 0]
                        if b["pitches"].ndim == 3
                        else b["pitches"][:1],
                    )["params"]

                state = create_gan_state(
                    gen_init, discs, b["audio"][:1], rng, tx_g, tx_d
                )
                if args.pretrained:
                    import pickle

                    from fish_diffusion_tpu.training.checkpoint import (
                        load_pretrained_params,
                    )

                    with open(args.pretrained, "rb") as f:
                        pre = pickle.load(f)
                    state = state.replace(
                        params_g=load_pretrained_params(
                            pre.get("params", pre), state.params_g
                        )
                    )
                if args.resume and ckpt.latest_step() is not None:
                    state = ckpt.restore(state)

            state, metrics = step_fn(state, shard_batch(b, mesh), rng)

            step = int(state.step)
            if step % 10 == 0:
                now = time.perf_counter()
                logger.log_scalars(
                    step,
                    {
                        **{k: float(v) for k, v in metrics.items()},
                        "steps_per_sec": 10 / max(now - t_last, 1e-9),
                    },
                )
                t_last = now

            if step % cfg.trainer.get("val_check_interval", 5000) == 0:
                ckpt.save(state, {k: float(v) for k, v in metrics.items()})

            if step >= max_steps:
                ckpt.save(state)
                ckpt.wait()  # async writer: durable before exit
                return


if __name__ == "__main__":
    main()
