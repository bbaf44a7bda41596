"""Sequence parallelism (parallel/sp.py): dp x seq x model mesh, activations
time-sharded, loss bit-parity with the unsharded model. The reference has no
SP (SURVEY.md §5) — this is the framework's long-context extension."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fish_diffusion_tpu.models import build_model
from fish_diffusion_tpu.parallel import make_mesh, shard_batch_sp
from fish_diffusion_tpu.parallel.tp import llama_param_shardings


def _llama_tts():
    return build_model(
        dict(
            type="GradTTS",
            diffusion=dict(
                type="GaussianDiffusion",
                mel_channels=16,
                timesteps=20,
                sampler_interval=5,
                denoiser=dict(
                    type="LlamaDenoiser",
                    diffusion_channels=16,
                    hidden_size=64,
                    num_hidden_layers=2,
                    num_attention_heads=4,
                    intermediate_size=128,
                    vocab_size=64,
                ),
                spec_min=[-1],
                spec_max=[1],
            ),
        )
    )


class TestSequenceParallel:
    def test_dp_sp_tp_train_step_parity(self):
        mesh = make_mesh(
            axis_shapes=(2, 2, 2), axis_names=("data", "seq", "model")
        )
        model = _llama_tts()

        B, T_MEL, T_TOK = 4, 32, 8
        batch = dict(
            speakers=None,
            contents=jnp.ones((B, T_TOK), jnp.int32),
            contents_lens=jnp.full((B,), T_TOK, jnp.int32),
            mel=jnp.zeros((B, T_MEL, 16)),
            mel_lens=jnp.full((B,), T_MEL, jnp.int32),
        )
        params = model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
            **batch,
        )["params"]

        psh = llama_param_shardings(params, mesh)
        params_tp = jax.tree_util.tree_map(jax.device_put, params, psh)
        tx = optax.adamw(1e-4)
        opt = tx.init(params_tp)
        sb = shard_batch_sp(batch, mesh)
        assert sb["mel"].sharding.spec == ("data", "seq")
        # token axis (8) divides seq (2) -> also time-sharded
        assert sb["contents"].sharding.spec == ("data", "seq")

        @jax.jit
        def step(params, opt, batch, rng):
            def loss_fn(p):
                return model.apply(
                    {"params": p}, **batch, rngs={"diffusion": rng}
                )["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt, loss

        _, _, loss = step(params_tp, opt, sb, jax.random.PRNGKey(2))
        loss = float(loss)
        assert np.isfinite(loss)

        # parity with the unsharded model (same rng -> same q_sample draw)
        ref = float(
            model.apply(
                {"params": params}, **batch, rngs={"diffusion": jax.random.PRNGKey(2)}
            )["loss"]
        )
        np.testing.assert_allclose(loss, ref, rtol=2e-5)

    def test_indivisible_time_axis_falls_back(self):
        mesh = make_mesh(axis_shapes=(4, 2), axis_names=("data", "seq"))
        batch = dict(x=jnp.zeros((4, 31, 8)))  # 31 % 2 != 0
        sb = shard_batch_sp(batch, mesh)
        assert sb["x"].sharding.spec == ("data",)
