"""LoRA fine-tuning tests: zero-init equivalence, adapter-only training,
merge."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from fish_diffusion_tpu.models import build_model
from fish_diffusion_tpu.training.lora import (
    apply_lora,
    create_lora_state,
    init_lora,
    make_lora_train_step,
    merge_lora,
)

B, T, MEL = 2, 32, 16


def small_model_and_batch():
    model = build_model(
        dict(
            type="DiffSinger",
            diffusion=dict(
                type="GaussianDiffusion",
                mel_channels=MEL,
                timesteps=20,
                sampler_interval=5,
                denoiser=dict(
                    type="WaveNetDenoiser",
                    mel_channels=MEL,
                    d_encoder=12,
                    residual_channels=8,
                    residual_layers=2,
                    dilation_cycle=2,
                ),
                spec_min=[-1],
                spec_max=[1],
            ),
            text_encoder=dict(
                type="NaiveProjectionEncoder", input_size=8, output_size=12
            ),
            speaker_encoder=dict(
                type="NaiveProjectionEncoder",
                input_size=2,
                output_size=12,
                use_embedding=True,
            ),
        )
    )
    rng = np.random.default_rng(0)
    batch = dict(
        speakers=jnp.zeros((B,), jnp.int32),
        contents=jnp.asarray(rng.standard_normal((B, T, 8)), jnp.float32),
        mel=jnp.asarray(rng.uniform(-1, 1, (B, T, MEL)), jnp.float32),
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        speakers=batch["speakers"],
        contents=batch["contents"],
        mel=batch["mel"],
    )["params"]
    return model, params, batch


class TestLora:
    def test_zero_init_is_identity(self):
        _, params, _ = small_model_and_batch()
        lora = init_lora(params, rank=4)
        eff = apply_lora(params, lora, alpha=8, rank=4)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(eff)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_targets_are_2d_kernels_and_embeddings(self):
        _, params, _ = small_model_and_batch()
        lora = init_lora(params, rank=4)
        flat = jax.tree_util.tree_flatten_with_path(
            lora, is_leaf=lambda x: isinstance(x, dict) and set(x) == {"a", "b"}
        )[0]
        paths = [jax.tree_util.keystr(p) for p, _ in flat]
        assert any("kernel" in p for p in paths)
        assert any("embedding" in p for p in paths)
        # adapters are low-rank
        for _, ad in flat:
            assert ad["a"].shape[1] == 4 and ad["b"].shape[0] == 4

    def test_train_updates_adapters_not_base(self):
        model, params, batch = small_model_and_batch()
        tx = optax.adam(1e-2)
        state = create_lora_state(params, tx, rank=4)
        step = make_lora_train_step(model, tx, alpha=8, rank=4)

        base_before = jax.tree_util.tree_map(np.asarray, state.base_params)
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))

        # base unchanged
        for a, b in zip(
            jax.tree_util.tree_leaves(base_before),
            jax.tree_util.tree_leaves(state.base_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # adapters moved (b factors nonzero after update)
        flat = jax.tree_util.tree_flatten_with_path(
            state.lora,
            is_leaf=lambda x: isinstance(x, dict) and set(x) == {"a", "b"},
        )[0]
        moved = any(np.abs(np.asarray(ad["b"])).max() > 0 for _, ad in flat)
        assert moved

        # merged params differ from base
        merged = merge_lora(state.base_params, state.lora, alpha=8, rank=4)
        diff = max(
            np.abs(np.asarray(a) - np.asarray(b)).max()
            for a, b in zip(
                jax.tree_util.tree_leaves(merged),
                jax.tree_util.tree_leaves(state.base_params),
            )
        )
        assert diff > 0
