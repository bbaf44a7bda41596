"""The training loop — replaces ``pl.Trainer`` + ``DiffSingerLightning``
(reference ``tools/diffusion/train.py:122-128``,
``archs/diffsinger/diffsinger.py:182-406``).

Responsibilities, with reference parity notes:
- jitted SPMD train step over the ``data`` mesh axis (DDP equivalent)
- ``val_check_interval`` validation: loss + full reverse diffusion on the
  valid batch, mel figures + gt/pred audio artifacts (diffsinger.py:308-377)
- EMA maintained inside the train step; validation uses EMA params
- checkpoint every validation, keep-all (trainers/base.py:21-25); resume
  restores params/optimizer/EMA/step
- metrics to TensorBoard when available, always to a JSONL file
- LR logged per step (LearningRateMonitor parity)
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import make_mesh
from ..parallel.distributed import make_global_batch
from .checkpoint import CheckpointManager, load_pretrained_params
from .optim import build_lr_schedule, build_optimizer
from .state import _model_kwargs, create_train_state, make_train_step


class ExperimentLogger:
    """Optional experiment-tracking backend hook (WandB-shaped interface).

    The reference defaults to ``WandbLogger(log_model=True, resume="must",
    id=...)`` (``tools/diffusion/train.py:108-119``). wandb is not bundled
    with this image, so ``MetricsLogger`` accepts any object with this
    surface; ``WandbExperimentLogger`` below binds it to wandb when that
    package exists.
    """

    def init_run(self, project: str, name: Optional[str], run_id: Optional[str],
                 resume: bool, config: Optional[dict]) -> str:
        """Start/resume a run; returns the (possibly generated) run id."""
        raise NotImplementedError

    def log_scalars(self, step: int, scalars: dict):
        raise NotImplementedError

    def log_artifact(self, path, kind: str = "model"):
        """``log_model=True`` equivalent: upload a checkpoint artifact."""
        raise NotImplementedError

    def finish(self):
        pass


class WandbExperimentLogger(ExperimentLogger):
    """Binds the hook to wandb when importable (reference
    tools/diffusion/train.py:111-119: run-id resume + log_model)."""

    def __init__(self, entity: Optional[str] = None):
        import wandb  # raises cleanly when absent

        self._wandb = wandb
        self._entity = entity
        self._run = None

    def init_run(self, project, name, run_id, resume, config):
        self._run = self._wandb.init(
            project=project,
            entity=self._entity,
            name=name,
            id=run_id,
            resume="must" if (resume and run_id) else None,
            config=config,
        )
        return self._run.id

    def log_scalars(self, step, scalars):
        self._wandb.log(dict(scalars), step=step)

    def log_artifact(self, path, kind="model"):
        art = self._wandb.Artifact(Path(path).stem, type=kind)
        art.add_dir(str(path)) if Path(path).is_dir() else art.add_file(str(path))
        self._run.log_artifact(art)

    def finish(self):
        if self._run is not None:
            self._run.finish()


class MetricsLogger:
    """JSONL always; TensorBoard when the package is importable; plus an
    optional ``ExperimentLogger`` backend (WandB-shaped hook).

    Run-id resume parity: the active run id persists in
    ``<log_dir>/run_id.txt`` so a restart can hand the same id back to the
    backend (reference ``tools/diffusion/train.py:111-119``).
    """

    def __init__(self, log_dir, backend: Optional[ExperimentLogger] = None,
                 project: str = "fish-diffusion-tpu",
                 run_name: Optional[str] = None,
                 resume: bool = False, config: Optional[dict] = None):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(str(self.log_dir / "tb"))
        except Exception:
            self._tb = None

        self.backend = backend
        if backend is not None:
            run_id_file = self.log_dir / "run_id.txt"
            prev_id = (
                run_id_file.read_text().strip()
                if (resume and run_id_file.exists())
                else None
            )
            run_id = backend.init_run(project, run_name, prev_id, resume, config)
            run_id_file.write_text(str(run_id))

    def log_scalars(self, step: int, scalars: dict):
        rec = {"step": step, "time": time.time(), **{k: float(v) for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
        if self.backend is not None:
            self.backend.log_scalars(step, scalars)

    def log_model(self, checkpoint_path):
        """reference WandbLogger(log_model=True) equivalent."""
        if self.backend is not None:
            self.backend.log_artifact(checkpoint_path, kind="model")

    def log_figure(self, step: int, tag: str, fig):
        if self._tb:
            self._tb.add_figure(tag, fig, step)
        else:
            fig.savefig(self.log_dir / f"{tag.replace('/', '_')}_{step}.png")

    def log_audio(self, step: int, tag: str, wav: np.ndarray, sample_rate: int):
        if self._tb:
            import torch

            self._tb.add_audio(
                tag, torch.from_numpy(np.asarray(wav)[None]), step, sample_rate
            )
        else:
            from ..utils.audio import save_wav

            save_wav(
                self.log_dir / f"{tag.replace('/', '_')}_{step}.wav",
                wav,
                sample_rate,
            )

    def close(self):
        self._jsonl.close()
        if self._tb:
            self._tb.close()
        if self.backend is not None:
            self.backend.finish()


class Trainer:
    def __init__(
        self,
        config,
        model=None,
        vocoder=None,
        log_dir: str = "logs",
        checkpoint_dir: Optional[str] = None,
        mesh=None,
        steps_per_epoch: Optional[int] = None,
        logger_backend: Optional["ExperimentLogger"] = None,
        run_name: Optional[str] = None,
        resume_run: bool = False,
    ):
        from ..models import build_model
        from ..registry import VOCODERS

        self.config = config
        tc = config.trainer

        self.model = (
            model
            if model is not None
            else build_model(
                config.model, precision=tc.get("precision"), training=True
            )
        )

        self.ema_momentum = config.get("ema_momentum", None)

        # LoRA fine-tuning (reference diffsinger.py:190-209 via loralib;
        # here a functional adapter pytree, training/lora.py)
        self.lora = config.get("lora", False)
        self.lora_rank = config.get("lora_rank", 16)
        self.lora_alpha = config.get("lora_alpha", 16.0)

        self.optimizer = build_optimizer(
            dict(config.optimizer),
            dict(config.scheduler) if config.get("scheduler") else None,
            grad_clip_val=tc.get("gradient_clip_val"),
            accumulate_grad_batches=tc.get("accumulate_grad_batches", 1),
            steps_per_epoch=steps_per_epoch,
        )
        self.lr_schedule = build_lr_schedule(
            dict(config.scheduler) if config.get("scheduler") else None,
            dict(config.optimizer).get("lr", 1.0),
            steps_per_epoch,
        )

        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = int(np.prod(self.mesh.devices.shape))

        self.max_steps = tc.get("max_steps", 2_000_000)
        self.val_check_interval = tc.get("val_check_interval", 5000)
        self.log_every_n_steps = tc.get("log_every_n_steps", 10)

        self.logger = MetricsLogger(
            log_dir,
            backend=logger_backend,
            run_name=run_name,
            resume=resume_run,
            config=dict(config) if logger_backend is not None else None,
        )
        self.ckpt = CheckpointManager(
            checkpoint_dir or (Path(log_dir) / "checkpoints"),
            save_top_k=tc.get("checkpoint", {}).get("save_top_k", -1),
            # Lightning ModelCheckpoint(every_n_train_steps=...) equivalent:
            # thin checkpoints below the validation cadence (orbax skips
            # saves closer than this; the final save always lands)
            save_interval_steps=tc.get("checkpoint", {}).get(
                "every_n_train_steps"
            ),
        )

        # frozen vocoder for validation artifacts (diffsinger.py:212-213)
        self.vocoder = vocoder
        if self.vocoder is None and config.model.get("vocoder"):
            try:
                self.vocoder = VOCODERS.build(dict(config.model.vocoder))
            except Exception as e:
                print(f"[trainer] vocoder unavailable for validation audio: {e}")

        # FSDP (ZeRO-3 equivalent, parallel/fsdp.py): params + optimizer
        # moments sharded over `data`; the step is built lazily in
        # init_state because shardings need the concrete state tree
        self.fsdp = bool(tc.get("fsdp", False))
        self.fsdp_min_size = tc.get("fsdp_min_size", None)

        if self.lora:
            from .lora import make_lora_train_step

            self._train_step = make_lora_train_step(
                self.model, self.optimizer, self.lora_alpha, self.lora_rank,
                self.mesh,
            )
        elif self.fsdp:
            self._train_step = None
        else:
            self._train_step = make_train_step(
                self.model, self.optimizer, self.ema_momentum, self.mesh
            )
        self._sample_rate = config.get("sampling_rate", 44100)

    # -- state ------------------------------------------------------------

    def init_state(self, example_batch, seed: int = 42):
        batch = {k: jnp.asarray(v) for k, v in _clean_batch(example_batch).items()}
        base = create_train_state(
            self.model,
            batch,
            jax.random.PRNGKey(seed),
            self.optimizer,
            ema_momentum=None if self.lora else self.ema_momentum,
        )
        if self.lora:
            from .lora import create_lora_state

            return create_lora_state(
                base.params, self.optimizer, rank=self.lora_rank,
                rng=jax.random.PRNGKey(seed + 1),
            )
        if self.fsdp:
            from ..parallel.fsdp import DEFAULT_MIN_SIZE, fsdp_state_shardings

            shardings = fsdp_state_shardings(
                base, self.mesh,
                min_size=self.fsdp_min_size or DEFAULT_MIN_SIZE,
            )
            self._train_step = make_train_step(
                self.model, self.optimizer, self.ema_momentum, self.mesh,
                state_shardings=shardings,
            )
            return jax.tree_util.tree_map(jax.device_put, base, shardings)
        return base

    def load_pretrained(self, state, pretrained_params):
        if self.lora:
            return state.replace(
                base_params=load_pretrained_params(
                    pretrained_params, state.base_params
                )
            )
        params = load_pretrained_params(pretrained_params, state.params)
        new = state.replace(params=params)
        if state.ema_params is not None:
            new = new.replace(
                ema_params=load_pretrained_params(pretrained_params, state.ema_params)
            )
        return new

    # -- the loop ---------------------------------------------------------

    def fit(self, train_loader, valid_loader, resume: bool = False, seed: int = 42):
        """Train until ``max_steps`` (or ``max_epochs`` if set in
        ``trainer``).

        The input pipeline is asynchronous (``datasets/prefetch.py``): a
        feeder thread collates and dispatches the ``device_put`` for batch
        N+1 while the device runs step N, and the loop never forces a
        per-step sync — the step counter lives on the host and metric
        reads are deferred one logging interval (by which time the step
        has finished, so the ``float()`` is free). This replaces the
        reference's DataLoader-worker overlap
        (``datasets/naive.py:44-49``, ``datasets/utils.py:13-34``).

        Resume semantics (same as the reference in practice, now stated):
        ``resume=True`` restores params/optimizer/EMA/step from the latest
        checkpoint, but NOT the loader position — the epoch restarts at a
        fresh shuffle. With step-based validation/checkpointing and
        shuffled data this only re-draws sample order.
        """
        import itertools

        from ..datasets.prefetch import DeferredLogger, DeviceFeeder

        # wall-clock accounting starts at fit() ENTRY: the r4 TTS proof
        # found ~1/3 of its wall time hiding between fit() entry and the
        # first train step (jitted init of a 253M-param state + optimizer
        # + restore scan) — ``setup_s`` makes that visible instead of
        # letting total_s silently disagree with the caller's stopwatch.
        t_fit0 = time.perf_counter()
        rng = jax.random.PRNGKey(seed)
        max_epochs = self.config.trainer.get("max_epochs")
        self._epoch = 0

        # trainer.transfer_dtype (e.g. "float16"): cast float inputs on the
        # host before device_put, halving H2D bytes. Off by default; useful
        # when the host<->device link is the bottleneck (the dev tunnel
        # here moves ~50 MB/s; a batch-20 diffusion batch is ~20 MB).
        # f16's 10-bit mantissa is ample for mel/content features.
        transfer_dtype = self.config.trainer.get("transfer_dtype")
        # trainer.cache_batches_on_device: replay epoch-1 device batches
        # from HBM for all later epochs (CachedDeviceFeeder docstring has
        # the semantics/memory contract). The big lever when host->device
        # bandwidth, not compute, bounds sustained throughput.
        cache_on_device = self.config.trainer.get(
            "cache_batches_on_device", False
        )
        # trainer.cache_bytes_budget: partial cache for beyond-HBM corpora —
        # keep at most this many bytes of device batches resident and stream
        # the remainder each epoch (CachedDeviceFeeder docstring). Setting a
        # budget implies caching.
        cache_budget = self.config.trainer.get("cache_bytes_budget")
        if cache_budget is not None:
            cache_on_device = True

        def _clean(batch):
            clean = {}
            for k, v in _clean_batch(batch).items():
                arr = np.asarray(v)
                if transfer_dtype and arr.dtype == np.float32:
                    arr = arr.astype(transfer_dtype)
                clean[k] = arr
            return clean

        def one_epoch():
            for batch in train_loader:
                yield _clean(batch)

        def host_batches():
            while max_epochs is None or self._epoch < max_epochs:
                self._epoch += 1
                produced = False
                for b in one_epoch():
                    produced = True
                    yield b
                if not produced:  # empty loader: stop, don't spin forever
                    return

        if cache_on_device:
            batches = one_epoch()
        else:
            batches = host_batches()
        first = next(batches, None)
        if first is None:
            return None

        state = self.init_state(first, seed)
        if resume and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
            print(f"[trainer] resumed at step {int(state.step)}")
        step = int(state.step)

        t_emit = [time.perf_counter()]
        last_emit_step = [step]

        def emit(s, scalars):
            # numerator = true step delta: the first emit after a
            # validation spans more than one log interval
            now = time.perf_counter()
            scalars["steps_per_sec"] = max(s - last_emit_step[0], 1) / max(
                now - t_emit[0], 1e-9
            )
            last_emit_step[0] = s
            t_emit[0] = now
            self.logger.log_scalars(s, scalars)

        # lr schedules are jnp-based (optax traces them inside the jitted
        # update); evaluating one eagerly on the accelerator would enqueue
        # a tiny program behind the whole dispatched step backlog and
        # float() would sync on it. Pin the informational lr read to the
        # host CPU backend instead.
        try:
            _host_dev = jax.devices("cpu")[0]
        except RuntimeError:
            _host_dev = None

        def host_lr(s):
            if _host_dev is None:
                return float(self.lr_schedule(s))
            with jax.default_device(_host_dev):
                return float(self.lr_schedule(s))

        dlog = DeferredLogger(emit)
        # wall-clock attribution (VERDICT r3 next #3): quoting the median
        # step rate while compile/validation/checkpointing eat the wall is
        # dishonest — account for every second and expose the breakdown as
        # ``last_wall_breakdown`` (proof drivers commit it to artifacts).
        wall = {
            "setup_s": time.perf_counter() - t_fit0,
            "first_step_s": None,
            "validation_s": 0.0,
            "checkpoint_s": 0.0,
        }
        put_fn = lambda b: make_global_batch(b, self.mesh)
        if cache_on_device:
            from ..datasets.prefetch import CachedDeviceFeeder

            def _set_epoch(e):
                self._epoch = e

            feeder = CachedDeviceFeeder(
                itertools.chain([first], batches),
                put_fn=put_fn,
                epochs=max_epochs,
                seed=seed + 977,
                on_epoch=_set_epoch,
                cache_bytes_budget=cache_budget,
                more_batches_fn=one_epoch,
            )
        else:
            feeder = DeviceFeeder(
                itertools.chain([first], batches), put_fn=put_fn
            )
        try:
            for sharded in feeder:
                t_s0 = time.perf_counter()
                state, metrics = self._train_step(state, sharded, rng)
                if wall["first_step_s"] is None:
                    # sync once: first step = compile + execute (the compile
                    # proxy in the wall breakdown)
                    _ = float(metrics["loss"])
                    wall["first_step_s"] = time.perf_counter() - t_s0
                step += 1

                if step % self.log_every_n_steps == 0:
                    named = {"train_loss": metrics["loss"]}
                    if "grad_norm" in metrics:
                        named["grad_norm"] = metrics["grad_norm"]
                    dlog.push(
                        step,
                        named,
                        extra={"lr": host_lr(step)},
                    )

                if step % self.val_check_interval == 0 or step >= self.max_steps:
                    dlog.flush()
                    t_v0 = time.perf_counter()
                    val_loss = self.validate(state, valid_loader, step)
                    t_c0 = time.perf_counter()
                    wall["validation_s"] += t_c0 - t_v0
                    self.ckpt.save(
                        state,
                        {"valid_loss": val_loss},
                        force=step >= self.max_steps,
                    )
                    wall["checkpoint_s"] += time.perf_counter() - t_c0
                    t_emit[0] = time.perf_counter()
                    last_emit_step[0] = step

                if step >= self.max_steps:
                    return state
        finally:
            dlog.flush()
            # input-pipeline attribution (host_wait/put for DeviceFeeder,
            # cache_bytes/replays for CachedDeviceFeeder) for soak artifacts
            self.last_feeder_stats = dict(getattr(feeder, "stats", {}))
            feeder.close()
            # barrier the async checkpoint writer: callers must see a
            # durable checkpoint when fit() returns
            t_w0 = time.perf_counter()
            self.ckpt.wait()
            wall["checkpoint_s"] += time.perf_counter() - t_w0
            total = time.perf_counter() - t_fit0
            wall["total_s"] = total
            wall["train_steps_s"] = max(
                total
                - wall["setup_s"]
                - (wall["first_step_s"] or 0.0)
                - wall["validation_s"]
                - wall["checkpoint_s"],
                0.0,
            )
            self.last_wall_breakdown = wall
            self.logger.log_scalars(
                step, {f"wall_{k}": v for k, v in wall.items() if v is not None}
            )

        # max_epochs exhausted: final validation + checkpoint. Runs after
        # the finally block finalized the breakdown, so attribute its cost
        # explicitly (validation_s/checkpoint_s/total_s stay exhaustive:
        # total_s == setup+first_step+train_steps+validation+checkpoint).
        t_v0 = time.perf_counter()
        val_loss = self.validate(state, valid_loader, step)
        t_c0 = time.perf_counter()
        self.ckpt.save(state, {"valid_loss": val_loss}, force=True)
        self.ckpt.wait()
        t_end = time.perf_counter()
        wall["validation_s"] += t_c0 - t_v0
        wall["checkpoint_s"] += t_end - t_c0
        wall["total_s"] += t_end - t_v0
        self.logger.log_scalars(
            step, {f"wall_{k}": v for k, v in wall.items() if v is not None}
        )
        return state

    # -- validation -------------------------------------------------------

    import functools as _functools

    @_functools.partial(jax.jit, static_argnums=0)
    def _val_loss_fn(self, params, batch):
        """Jitted per-bucket-shape validation loss (eager model.apply
        executes op-by-op over a remote-device tunnel)."""
        out = self.model.apply(
            {"params": params},
            **_model_kwargs(batch),
            rngs={"diffusion": jax.random.PRNGKey(0)},
        )
        return out["loss"]

    @_functools.partial(jax.jit, static_argnums=(0, 3))
    def _sample_fn(self, params, kwargs, sampler_interval=None):
        return self.model.apply(
            {"params": params},
            **kwargs,
            sampler_interval=sampler_interval,
            method=self.model.sample,
            rngs={"diffusion": jax.random.PRNGKey(1)},
        )

    def validate(self, state, valid_loader, step: int) -> float:
        """Loss over the valid set; full reverse diffusion + artifacts only
        on the first batch. ``trainer.limit_val_batches`` caps the loop
        (reference behavior is uncapped, which at val_check_interval=5000
        on real datasets makes validation dominate wall-clock)."""
        losses = []
        first = True
        params = self._inference_params(state)
        limit = self.config.trainer.get("limit_val_batches")

        import itertools

        bounded = (
            itertools.islice(valid_loader, limit) if limit is not None else valid_loader
        )
        for batch in bounded:
            clean = _clean_batch(batch)
            jb = {k: jnp.asarray(v) for k, v in clean.items()}

            losses.append(float(self._val_loss_fn(params, jb)))

            if first:
                first = False
                self._log_samples(params, jb, batch, step)

        val_loss = float(np.mean(losses)) if losses else float("nan")
        self.logger.log_scalars(step, {"valid_loss": val_loss})
        return val_loss

    def _inference_params(self, state):
        if self.lora:
            from .lora import merge_lora

            return merge_lora(
                state.base_params, state.lora, self.lora_alpha, self.lora_rank
            )
        return state.inference_params()

    def _log_samples(self, params, jb, batch, step):
        """Full reverse diffusion on the first valid batch; log mel figures
        and gt/pred audio (reference diffsinger.py:308-377)."""
        from ..utils.viz import viz_synth_sample

        kwargs = _model_kwargs(jb)
        mel_target = kwargs.pop("mel")
        # trainer.val_sampler_interval: coarser reverse diffusion at
        # validation (e.g. 50 -> 20 denoiser evals) — validation cost is
        # pure overhead in the wall breakdown, and the val mel artifact
        # does not need the production sampler density
        pred = self._sample_fn(
            params, kwargs, self.config.trainer.get("val_sampler_interval")
        )

        mel_lens = np.asarray(
            jb.get("mel_lens", jnp.full((pred.shape[0],), pred.shape[1]))
        )
        pitches = jb.get("pitches")

        n_samples = min(2, pred.shape[0])
        for idx in range(n_samples):
            gt_pitch = None
            if pitches is not None:
                p = np.asarray(pitches[idx])
                gt_pitch = p[:, 0] if p.ndim == 2 else p

            fig, wav_rec, wav_pred = viz_synth_sample(
                gt_mel=np.asarray(mel_target[idx]),
                gt_pitch=gt_pitch,
                predict_mel=np.asarray(pred[idx]),
                predict_mel_len=int(mel_lens[idx]),
                gt_mel_len=int(mel_lens[idx]),
                vocoder=self.vocoder if getattr(self.vocoder, "params", None) is not None else None,
            )
            self.logger.log_figure(step, f"sample-{idx}/mels", fig)
            try:
                import matplotlib.pyplot as plt

                plt.close(fig)
            except Exception:
                pass

            if wav_rec is not None:
                self.logger.log_audio(
                    step, f"sample-{idx}/wav_gt", wav_rec, self._sample_rate
                )
                self.logger.log_audio(
                    step, f"sample-{idx}/wav_pred", wav_pred, self._sample_rate
                )


def _clean_batch(batch: dict) -> dict:
    """Keep only numeric-array batch entries; drop paths and the static
    ``*_max_len`` scalars (shapes already carry them under jit)."""
    out = {}
    for k, v in batch.items():
        if k == "path" or k.endswith("_max_len"):
            continue
        arr = np.asarray(v)
        if arr.dtype.kind in "fiub":
            out[k] = arr
    return out
