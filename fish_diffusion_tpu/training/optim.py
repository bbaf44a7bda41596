"""Optimizers + LR schedules (optax).

Parity targets:
- ``LambdaWarmUpCosineScheduler`` (reference
  ``fish_diffusion/schedulers/warmup_cosine_scheduler.py:6-55``): linear
  warmup from ``val_start`` to ``val_base``, then cosine decay to
  ``val_final`` over ``max_decay_steps``; used with base lr 1.0
  (``configs/_base_/schedulers/warmup_cosine.py:5-24``)
- ``LambdaCosineScheduler`` (``cosine_scheduler.py:5-27``)
- torch StepLR / ExponentialLR equivalents
- AdamW with grad clipping (``configs/_base_/trainers/base.py:11-12``: global
  norm 0.5) and gradient accumulation (optax.MultiSteps)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import optax

from ..registry import LR_SCHEDULERS, OPTIMIZERS


@LR_SCHEDULERS.register_module(name="LambdaWarmUpCosineScheduler")
def warmup_cosine_schedule(
    val_base: float,
    val_final: float,
    max_decay_steps: int,
    val_start: float = 0.0,
    warm_up_steps: int = 0,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (val_base - val_start) / max(warm_up_steps, 1) * step + val_start
        t = jnp.clip(
            (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1),
            0.0,
            1.0,
        )
        cos = val_final + 0.5 * (val_base - val_final) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule


@LR_SCHEDULERS.register_module(name="LambdaCosineScheduler")
def cosine_schedule(lr_min: float, lr_max: float, max_decay_steps: int):
    def schedule(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max_decay_steps, 0.0, 1.0)
        return lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))

    return schedule


@LR_SCHEDULERS.register_module(name="StepLR")
def step_schedule(step_size: int, gamma: float = 0.1, base_lr: float = 1.0):
    # torch.optim.lr_scheduler.StepLR has no base_lr arg — the factor starts
    # at 1 and the optimizer lr multiplies in (build_lr_schedule); base_lr
    # stays overridable for LambdaLR-style configs that set it explicitly.
    def schedule(step):
        return base_lr * gamma ** jnp.floor(
            jnp.asarray(step, jnp.float32) / step_size
        )

    return schedule


@LR_SCHEDULERS.register_module(name="ExponentialLR")
def exponential_schedule(gamma: float, base_lr: float = 1.0):
    def schedule(step):
        return base_lr * gamma ** jnp.asarray(step, jnp.float32)

    return schedule


def build_lr_schedule(
    scheduler_cfg: Optional[Dict[str, Any]],
    base_lr: float,
    steps_per_epoch: Optional[int] = None,
):
    """Build an optax schedule from a scheduler config.

    Mirrors the reference pattern where the scheduler is a multiplicative
    lambda on top of the optimizer lr (usually 1.0):
    ``configs/_base_/schedulers/warmup_cosine.py``. Config forms:

    - ``{"type": "LambdaLR", "lr_lambda": {"type": "LambdaWarmUpCosineScheduler", ...}}``
    - ``{"type": "LambdaWarmUpCosineScheduler", ...}`` (direct)
    - ``None`` -> constant ``base_lr``

    ``interval`` semantics (matches the reference's Lightning stepping):

    - ``"step"`` (default): the scheduler advances once per optimizer step —
      the diffusion path (``archs/diffsinger/diffsinger.py:257``
      returns ``interval="step"``).
    - ``"epoch"``: the scheduler advances once per EPOCH — the GAN trainers
      call ``scheduler.step()`` only on ``trainer.is_last_batch``
      (``archs/hifisinger/hifisinger_v1.py:205-209``, same in
      ``tools/nsf_hifigan/train.py``). Requires ``steps_per_epoch`` (batches
      per epoch, i.e. ``len(train_loader)``) so the per-step optax schedule
      can hold the factor constant within an epoch:
      ``factor(floor(step / steps_per_epoch))``.
    """
    if scheduler_cfg is None:
        return optax.constant_schedule(base_lr)

    cfg = dict(scheduler_cfg)
    interval = cfg.pop("interval", "step")
    if interval not in ("step", "epoch"):
        raise ValueError(f"scheduler interval must be 'step'/'epoch', got {interval!r}")
    if interval == "epoch":
        if not steps_per_epoch or steps_per_epoch < 1:
            raise ValueError(
                "scheduler interval='epoch' requires steps_per_epoch "
                "(= len(train_loader)); pass it through "
                "build_optimizer(..., steps_per_epoch=...)"
            )

    def to_sched_step(step):
        if interval == "epoch":
            return jnp.floor_divide(jnp.asarray(step, jnp.int32), steps_per_epoch)
        return step

    if cfg.get("type") == "LambdaLR":
        inner = cfg["lr_lambda"]
        if callable(inner):
            return lambda step: base_lr * inner(to_sched_step(step))
        factor_schedule = LR_SCHEDULERS.build(dict(inner))
        return lambda step: base_lr * factor_schedule(to_sched_step(step))

    factor_schedule = LR_SCHEDULERS.build(cfg)
    return lambda step: base_lr * factor_schedule(to_sched_step(step))


@OPTIMIZERS.register_module(name="AdamW")
def adamw(
    learning_rate,
    weight_decay: float = 1e-2,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
):
    return optax.adamw(
        learning_rate=learning_rate,
        b1=betas[0],
        b2=betas[1],
        eps=eps,
        weight_decay=weight_decay,
    )


@OPTIMIZERS.register_module(name="Adam")
def adam(learning_rate, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay=None):
    if weight_decay:
        return optax.adamw(
            learning_rate=learning_rate,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
        )
    return optax.adam(learning_rate=learning_rate, b1=betas[0], b2=betas[1], eps=eps)


@OPTIMIZERS.register_module(name="SGD")
def sgd(learning_rate, momentum: float = 0.0, weight_decay=None):
    tx = optax.sgd(learning_rate=learning_rate, momentum=momentum or None)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def build_optimizer(
    optimizer_cfg: Dict[str, Any],
    scheduler_cfg: Optional[Dict[str, Any]] = None,
    grad_clip_val: Optional[float] = None,
    accumulate_grad_batches: int = 1,
    steps_per_epoch: Optional[int] = None,
) -> optax.GradientTransformation:
    """Full optimizer chain: clip -> optimizer(schedule) [-> accumulation].

    Mirrors the trainer config surface
    (``configs/_base_/trainers/base.py:11-19``). ``steps_per_epoch`` is
    required when the scheduler config sets ``interval="epoch"`` (GAN
    regime — see ``build_lr_schedule``).
    """
    cfg = dict(optimizer_cfg)
    base_lr = cfg.pop("lr", 1.0)
    schedule = build_lr_schedule(scheduler_cfg, base_lr, steps_per_epoch)

    tx = OPTIMIZERS.build({**cfg, "learning_rate": schedule})

    if grad_clip_val is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_val), tx)

    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)

    return tx
