"""Standalone vocoder GAN trainer (NSF-HiFiGAN / RefineGAN).

Capability parity with the reference trainers
``tools/nsf_hifigan/train.py:32-328`` (MPD+MSD, multi-STFT + multi-mel +
envelope aux losses) and ``tools/refinegan/train.py`` (MPD+MRD), built on
the jitted two-player step in ``training/gan.py``. The vocoder consumes
(audio, pitches) batches from ``NaiveVOCODERDataset``.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vocoders.nsf_hifigan import NsfHifiGANGenerator
from ..models.vocoders.refinegan import RefineGANGenerator
from ..ops.mel import LogMelSpectrogram
from ..parallel import make_mesh
from ..parallel.distributed import make_global_batch
from .gan import Discriminators, create_gan_state, make_gan_train_step
from .optim import build_optimizer
from .trainer import MetricsLogger


class VocoderTrainer:
    def __init__(
        self,
        config,
        log_dir: str = "logs/vocoder",
        mesh=None,
        steps_per_epoch=None,
    ):
        self.config = config
        mc = config.model

        gen_cfg = dict(mc.get("generator", {}))
        gen_type = gen_cfg.pop("type", "NsfHifiGAN")
        # trainer.precision="bf16-mixed" (the reference base-trainer default,
        # configs/_base_/trainers/base.py:18) -> bf16 GENERATOR activations;
        # params stay f32. Discriminator compute dtype is a separate knob
        # (trainer.discriminator_dtype, default bfloat16 — rationale below).
        precision = str((config.get("trainer") or {}).get("precision", ""))
        if "bf16" in precision and "dtype" not in gen_cfg:
            gen_cfg["dtype"] = jnp.bfloat16
        if gen_type in ("RefineGAN", "RefineGANGenerator"):
            self.generator = RefineGANGenerator(**gen_cfg)
            flavor = "v2"
        else:
            self.generator = NsfHifiGANGenerator(**gen_cfg)
            flavor = "v1"

        self.sampling_rate = getattr(self.generator, "sampling_rate", 44100)
        self.hop_length = getattr(
            self.generator, "hop_size", getattr(self.generator, "hop_length", 512)
        )

        self.mel_transform = LogMelSpectrogram(
            sample_rate=self.sampling_rate,
            hop_length=self.hop_length,
            n_mels=getattr(self.generator, "num_mels", 128),
        )

        # discriminator COMPUTE dtype: trainer.discriminator_dtype.
        # DEFAULT bfloat16 — a deliberate TPU-native deviation from the
        # reference's "32-true" GAN pin (svc_hifisinger_v2.py:112): the
        # discriminators own ~90% of the step's HBM bytes and the step is
        # at its bandwidth roofline, so bf16 compute buys 4.67 -> 5.80
        # steps/s (docs/artifacts/vocoder_step_attribution_r05.json); a
        # 2000-step seed-matched trend comparison shows interleaving,
        # statistically indistinguishable mel/val curves
        # (docs/artifacts/vocoder_trend_{f32d,bf16d}_r05.json). Params,
        # weight/spectral-norm kernel math, and loss reductions stay f32
        # either way. Set "float32" for strict reference parity.
        d_dtype_name = str(
            (config.get("trainer") or {}).get("discriminator_dtype", "bfloat16")
        )
        d_dtype = jnp.bfloat16 if "bf" in d_dtype_name else None
        self.discs = Discriminators(
            flavor,
            mpd_cfg=dict(mc.get("mpd", {})) or None,
            mrd_cfg=dict(mc.get("mrd", {})) or None,
            dtype=d_dtype,
        )

        # GAN schedulers decay per EPOCH (reference hifisinger_v1.py:205-209);
        # steps_per_epoch = len(train_loader) must be threaded through.
        opt_cfg = dict(config.optimizer)
        sched_cfg = dict(config.scheduler) if config.get("scheduler") else None
        self.tx_g = build_optimizer(opt_cfg, sched_cfg, steps_per_epoch=steps_per_epoch)
        self.tx_d = build_optimizer(opt_cfg, sched_cfg, steps_per_epoch=steps_per_epoch)

        self.mesh = mesh if mesh is not None else make_mesh()
        self.logger = MetricsLogger(log_dir)

        from .checkpoint import CheckpointManager

        self.ckpt = CheckpointManager(Path(log_dir) / "checkpoints")

        def generator_apply(params, batch, rng):
            audio = batch["audio"]
            if audio.ndim == 3:
                audio = audio[:, 0]
            pitches = batch["pitches"]
            if pitches.ndim == 3:
                pitches = pitches[:, 0]

            # mel from ground-truth audio, f0 at frame rate
            mel = self.mel_transform.wav2spec(audio)  # [B, M, T]
            mel = jnp.swapaxes(mel, 1, 2)
            n_frames = mel.shape[1]
            f0 = pitches[:, :: self.hop_length][:, :n_frames]
            return self.generator.apply(
                {"params": params}, mel, f0, rngs={"noise": rng}
            )

        self.generator_apply = generator_apply

        scales = mc.get(
            "multi_scale_mels",
            ((2048, self.hop_length, 2048), (2048, 270, 1080), (4096, 540, 2160)),
        )
        self._train_step = make_gan_train_step(
            generator_apply,
            self.discs,
            self.tx_g,
            self.tx_d,
            sampling_rate=self.sampling_rate,
            multi_scale_mels=tuple(tuple(s) for s in scales),
            mesh=self.mesh,
        )

    def init_state(self, example_batch, seed: int = 42):
        audio = jnp.asarray(example_batch["audio"])
        if audio.ndim == 3:
            audio = audio[:, 0]
        batch = {
            "audio": audio,
            "pitches": jnp.asarray(example_batch["pitches"]).reshape(
                audio.shape[0], -1
            ),
        }

        def gen_init():
            rng = jax.random.PRNGKey(seed)
            mel = jnp.zeros((1, 8, getattr(self.generator, "num_mels", 128)))
            f0 = jnp.full((1, 8), 220.0)
            return self.generator.init(
                {"params": rng, "noise": jax.random.fold_in(rng, 1)}, mel, f0
            )["params"]

        return create_gan_state(
            gen_init,
            self.discs,
            audio[:1],
            jax.random.PRNGKey(seed),
            self.tx_g,
            self.tx_d,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def _val_fn(self, params_g, audio, pitches):
        """One jitted program per val batch shape: synthesize + mel-L1.
        (Eager validation executes op-by-op over a remote-device tunnel —
        it cost minutes per pass before this was jitted.)"""
        y_hat = self.generator_apply(
            params_g, {"audio": audio, "pitches": pitches}, jax.random.PRNGKey(0)
        )
        n = min(audio.shape[1], y_hat.shape[1])
        mel_gt = self.mel_transform.wav2spec(audio[:, :n])
        mel_hat = self.mel_transform.wav2spec(y_hat[:, :n])
        return jnp.mean(jnp.abs(mel_gt - mel_hat)), y_hat[0, :n], audio[0, :n]

    def validate(self, state, valid_loader, step: int):
        """Mel-L1 on the valid set + a gt/pred audio artifact (reference
        vocoder trainers log reconstruction audio per validation)."""
        losses = []
        first = True
        for batch in valid_loader:
            audio = jnp.asarray(batch["audio"]).reshape(len(batch["audio"]), -1)
            pitches = jnp.asarray(batch["pitches"]).reshape(audio.shape[0], -1)
            l1, y_hat0, audio0 = self._val_fn(state.params_g, audio, pitches)
            losses.append(float(l1))

            if first:
                first = False
                self.logger.log_audio(
                    step, "val/gt", np.asarray(audio0), self.sampling_rate
                )
                self.logger.log_audio(
                    step, "val/pred", np.asarray(y_hat0), self.sampling_rate
                )

        val = float(np.mean(losses)) if losses else float("nan")
        self.logger.log_scalars(step, {"valid_mel_l1": val})
        return val

    def fit(self, train_loader, max_steps: Optional[int] = None, resume=False,
            valid_loader=None, valid_every: Optional[int] = None,
            log_every: int = 10, save_every: int = 5000, seed: int = 42,
            cache_batches: Optional[bool] = None):
        """Async feed (datasets/prefetch.py): collation + device_put run on
        a feeder thread, the step counter is host-side, and metric reads
        are deferred one log interval so the loop never syncs per step
        (reference overlap: DataLoader workers, ``datasets/utils.py:13-34``).

        ``cache_batches`` (or ``trainer.cache_batches_on_device`` in the
        config) keeps epoch-1 device batches resident in HBM and replays
        them permuted for later epochs — zero steady-state H2D, same
        trade-offs as the diffusion Trainer's cache (CachedDeviceFeeder
        docstring).
        """
        from ..datasets.prefetch import (
            CachedDeviceFeeder,
            DeferredLogger,
            DeviceFeeder,
        )

        max_steps = max_steps or self.config.trainer.get("max_steps", 1_000_000)
        valid_every = valid_every or save_every
        rng = jax.random.PRNGKey(seed)
        if cache_batches is None:
            cache_batches = bool(
                self.config.trainer.get("cache_batches_on_device", False)
            )
        # partial cache for beyond-HBM corpora (see CachedDeviceFeeder)
        cache_budget = self.config.trainer.get("cache_bytes_budget")
        if cache_budget is not None:
            cache_batches = True

        def one_epoch():
            for batch in train_loader:
                yield {
                    "audio": np.asarray(batch["audio"]).reshape(
                        len(batch["audio"]), -1
                    ),
                    "pitches": np.asarray(batch["pitches"]).reshape(
                        len(batch["pitches"]), -1
                    ),
                }

        def host_batches():
            while True:
                produced = False
                for b in one_epoch():
                    produced = True
                    yield b
                if not produced:  # empty loader: stop, don't spin forever
                    return

        batches = one_epoch() if cache_batches else host_batches()
        first = next(batches, None)
        if first is None:
            return None
        state = self.init_state(first, seed)
        if resume and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
        step = int(state.step)

        t_emit = [time.perf_counter()]
        last_emit_step = [step]

        def emit(s, scalars):
            # numerator = true step delta: after a validation/checkpoint
            # the elapsed window spans more than one log interval
            now = time.perf_counter()
            scalars["steps_per_sec"] = max(s - last_emit_step[0], 1) / max(
                now - t_emit[0], 1e-9
            )
            last_emit_step[0] = s
            t_emit[0] = now
            self.logger.log_scalars(s, scalars)

        dlog = DeferredLogger(emit)

        import itertools

        put_fn = lambda b: make_global_batch(b, self.mesh)
        if cache_batches:
            feeder = CachedDeviceFeeder(
                itertools.chain([first], batches),
                put_fn=put_fn,
                epochs=None,  # loop below terminates at max_steps
                seed=seed + 977,
                cache_bytes_budget=cache_budget,
                more_batches_fn=one_epoch,
            )
        else:
            feeder = DeviceFeeder(
                itertools.chain([first], batches), put_fn=put_fn
            )
        last_metrics = {}
        try:
            for sharded in feeder:
                state, metrics = self._train_step(state, sharded, rng)
                last_metrics = metrics
                step += 1

                if step % log_every == 0:
                    dlog.push(step, metrics)

                if valid_loader is not None and (
                    step % valid_every == 0 or step >= max_steps
                ):
                    dlog.flush()
                    self.validate(state, valid_loader, step)
                    t_emit[0] = time.perf_counter()
                    last_emit_step[0] = step

                if step % save_every == 0 or step >= max_steps:
                    dlog.flush()
                    self.ckpt.save(
                        state,
                        {k: float(v) for k, v in last_metrics.items()},
                        force=step >= max_steps,
                    )
                    t_emit[0] = time.perf_counter()
                    last_emit_step[0] = step

                if step >= max_steps:
                    return state
        finally:
            dlog.flush()
            feeder.close()
            # barrier the async checkpoint writer (durable ckpt on return)
            self.ckpt.wait()
