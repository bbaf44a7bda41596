"""LoRA fine-tuning, TPU-native.

Capability parity with the reference's loralib injection
(``archs/diffsinger/diffsinger.py:215-237``: every nn.Linear/nn.Embedding is
replaced by a LoRA layer and only adapters train). The idiomatic-JAX
formulation needs no module surgery: LoRA lives as a SEPARATE pytree of
(A, B) factors and the effective parameters are materialized functionally
inside the jitted step:

    W_eff = W + (alpha / rank) * A @ B

Training differentiates w.r.t. the LoRA pytree only (the base stays frozen
by construction — no optax masking or requires_grad machinery needed), and
``merge_lora`` folds adapters into the base for inference/export.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .state import _model_kwargs


def _is_lora_target(path, leaf) -> bool:
    """Dense kernels and embedding tables (the reference adapts
    nn.Linear + nn.Embedding)."""
    keys = [str(getattr(p, "key", p)) for p in path]
    if leaf.ndim != 2:
        return False
    return keys[-1] in ("kernel", "embedding")


def init_lora(
    params: Any,
    rank: int = 16,
    rng: Optional[jax.Array] = None,
    match: Callable = _is_lora_target,
) -> Any:
    """Create the LoRA pytree: {path: {"a": [in, r], "b": [r, out]}} mirrors
    of every matched 2-D parameter; ``a`` gaussian, ``b`` zeros (loralib
    init), so training starts at the base function."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    counter = [0]

    def make(path, leaf):
        if not match(path, leaf):
            return None
        counter[0] += 1
        key = jax.random.fold_in(rng, counter[0])
        fan_in, fan_out = leaf.shape
        return {
            "a": jax.random.normal(key, (fan_in, rank), jnp.float32)
            / np.sqrt(fan_in),
            "b": jnp.zeros((rank, fan_out), jnp.float32),
        }

    return jax.tree_util.tree_map_with_path(make, params)


def _is_adapter(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"a", "b"}


def apply_lora(params: Any, lora: Any, alpha: float = 16.0, rank: int = 16):
    """Materialize effective params: W + (alpha/rank) * A @ B."""
    scale = alpha / rank

    flat, _ = jax.tree_util.tree_flatten_with_path(lora, is_leaf=_is_adapter)
    adapters = {jax.tree_util.keystr(path): leaf for path, leaf in flat}

    def combine(path, w):
        l = adapters.get(jax.tree_util.keystr(path))
        if l is None:
            return w
        return w + scale * (l["a"] @ l["b"]).astype(w.dtype)

    return jax.tree_util.tree_map_with_path(combine, params)


def merge_lora(params: Any, lora: Any, alpha: float = 16.0, rank: int = 16):
    """Fold adapters into the base (for inference/export)."""
    return apply_lora(params, lora, alpha, rank)


class LoraTrainState(struct.PyTreeNode):
    step: jax.Array
    base_params: Any  # frozen
    lora: Any
    opt_state: Any


def create_lora_state(
    base_params: Any,
    optimizer: optax.GradientTransformation,
    rank: int = 16,
    rng: Optional[jax.Array] = None,
) -> LoraTrainState:
    lora = init_lora(base_params, rank=rank, rng=rng)
    return LoraTrainState(
        step=jnp.zeros((), jnp.int32),
        base_params=base_params,
        lora=lora,
        opt_state=optimizer.init(lora),
    )


def make_lora_train_step(
    model,
    optimizer: optax.GradientTransformation,
    alpha: float = 16.0,
    rank: int = 16,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Jitted LoRA step: grads flow into the adapters only."""

    def loss_fn(lora, base_params, batch, rng):
        params = apply_lora(base_params, lora, alpha, rank)
        out = model.apply(
            {"params": params}, **_model_kwargs(batch), rngs={"diffusion": rng}
        )
        return out["loss"]

    def step_fn(state: LoraTrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.lora, state.base_params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        new_state = state.replace(
            step=state.step + 1, lora=lora, opt_state=opt_state
        )
        return new_state, {"loss": loss}

    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        batch_shard = NamedSharding(mesh, P("data"))
        return jax.jit(
            step_fn,
            in_shardings=(replicated, batch_shard, replicated),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))
