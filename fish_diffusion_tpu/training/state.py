"""Train state + jitted SPMD train step for the diffusion regime.

Replaces the reference's Lightning plumbing
(``archs/diffsinger/diffsinger.py:182-406``: DiffSingerLightning with EMA and
DDP) with pure functions:

- ``TrainState`` — params / opt_state / EMA params pytree
- ``make_train_step`` — ONE jitted function: forward + backward + optax
  update + EMA, sharded over the ``data`` mesh axis. XLA:GSPMD inserts the
  gradient all-reduce over ICI; parameters are replicated. Donated input
  state keeps memory flat.

EMA matches the reference update
``ema = ema * m + p * (1 - m)`` (diffsinger.py:390-401) and, like the
reference, validation/inference prefers EMA params when enabled.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    def inference_params(self):
        """EMA params if enabled, else live params (reference
        diffsinger.py:259-264 uses the EMA model for validation)."""
        return self.ema_params if self.ema_params is not None else self.params


# Batch keys forwarded to the model, in the reference's batch contract
# (datasets/naive.py pipelines). *_max_len keys are implied by array shapes
# under jit (static shapes via bucketed collation).
_MODEL_KEYS = (
    "speakers",
    "contents",
    "contents_lens",
    "mel",
    "mel_lens",
    "pitches",
    "pitch_shift",
    "phones2mel",
    "energy",
)


def _model_kwargs(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    kwargs = {k: batch[k] for k in _MODEL_KEYS if k in batch}
    # accept the reference's singular key name too
    if "speaker" in batch and "speakers" not in kwargs:
        kwargs["speakers"] = batch["speaker"]
    if "key_shift" in batch and "pitch_shift" not in kwargs:
        kwargs["pitch_shift"] = batch["key_shift"]
    return kwargs


def create_train_state(
    model,
    example_batch: Dict[str, jax.Array],
    rng: jax.Array,
    optimizer: optax.GradientTransformation,
    ema_momentum: Optional[float] = None,
) -> TrainState:
    params_rng, diff_rng = jax.random.split(rng)
    # jit the init: eager flax init runs op-by-op, which is pathologically
    # slow over a remote-device tunnel
    variables = jax.jit(model.init)(
        {"params": params_rng, "diffusion": diff_rng},
        **_model_kwargs(example_batch),
    )
    params = variables["params"]
    opt_state = optimizer.init(params)
    ema_params = jax.tree_util.tree_map(jnp.copy, params) if ema_momentum else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        ema_params=ema_params,
    )


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    ema_momentum: Optional[float] = None,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    state_shardings=None,
) -> Callable:
    """Build the jitted SPMD train step.

    Returns ``train_step(state, batch, rng) -> (state, metrics)``.
    ``batch`` leaves are sharded over ``data``; state is replicated.
    """

    def loss_fn(params, batch, rng):
        out = model.apply(
            {"params": params},
            **_model_kwargs(batch),
            rngs={"diffusion": rng},
        )
        return out["loss"], out

    def step_fn(state: TrainState, batch, rng):
        # fold in the step so every step draws fresh noise
        rng = jax.random.fold_in(rng, state.step)

        (loss, _out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )

        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        ema_params = state.ema_params
        if ema_params is not None:
            m = ema_momentum
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e * m + p * (1.0 - m), ema_params, params
            )

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        batch_shard = NamedSharding(mesh, P("data"))
        # state_shardings: a pytree of NamedShardings matching TrainState
        # (e.g. from parallel.fsdp.fsdp_state_shardings) keeps params and
        # optimizer moments sharded across steps (ZeRO-3); default replicates
        state_sh = state_shardings if state_shardings is not None else replicated
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, batch_shard, replicated),
            out_shardings=(state_sh, replicated),
            donate_argnums=(0,) if donate else (),
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
