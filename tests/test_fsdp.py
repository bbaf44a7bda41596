"""FSDP (ZeRO-3 equivalent) sharding tests on the 8-device virtual mesh.

The reference's sharded-state training is DeepSpeed ZeRO-3 for the LLM-TTS
path (``tools/tts/ds_config.json``); here the same property — no device ever
holds a full copy of large params or Adam moments — is expressed purely as
GSPMD shardings (``parallel/fsdp.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from fish_diffusion_tpu.parallel import (
    fsdp_param_spec,
    fsdp_state_shardings,
    make_mesh,
    shard_batch,
)


class TestFsdpSpec:
    def test_small_leaves_replicated(self):
        leaf = jnp.zeros((256,))
        assert fsdp_param_spec(leaf, 8) == P(None)

    def test_largest_divisible_axis(self):
        leaf = jnp.zeros((48, 2048))
        assert fsdp_param_spec(leaf, 8) == P(None, "data")

    def test_indivisible_axes_replicated(self):
        leaf = jnp.zeros((513, 1027))
        assert fsdp_param_spec(leaf, 8) == P(None, None)

    def test_compose_with_tp(self):
        # TP already took the output axis; fsdp takes the input axis
        leaf = jnp.zeros((1024, 1024))
        spec = fsdp_param_spec(leaf, 4, base_spec=P(None, "model"))
        assert spec == P("data", "model")


class TestFsdpTrainStep:
    def test_sharded_state_end_to_end(self):
        """A full train step with FSDP state shardings: every large param
        and its Adam moments live sharded; loss matches replicated run."""
        from fish_diffusion_tpu.models import build_model
        from fish_diffusion_tpu.training.state import (
            create_train_state,
            make_train_step,
        )

        model = build_model(
            dict(
                type="DiffSinger",
                diffusion=dict(
                    type="GaussianDiffusion",
                    mel_channels=16,
                    noise_schedule="linear",
                    timesteps=20,
                    noise_loss="l1",
                    denoiser=dict(
                        type="WaveNetDenoiser",
                        mel_channels=16,
                        d_encoder=32,
                        residual_channels=64,
                        residual_layers=2,
                        dilation_cycle=2,
                    ),
                    sampler_interval=5,
                    spec_min=[-5],
                    spec_max=[0],
                ),
                text_encoder=dict(
                    type="NaiveProjectionEncoder", input_size=32, output_size=32
                ),
                speaker_encoder=dict(
                    type="NaiveProjectionEncoder",
                    input_size=4,
                    output_size=32,
                    use_embedding=True,
                ),
                pitch_encoder=dict(
                    type="NaiveProjectionEncoder",
                    input_size=1,
                    output_size=32,
                    preprocessing="pitch_to_scale",
                ),
            )
        )
        B, T = 8, 32
        batch = dict(
            speakers=jnp.zeros((B,), jnp.int32),
            contents=jnp.ones((B, T, 32)),
            mel=jnp.zeros((B, T, 16)),
            pitches=jnp.full((B, T), 220.0),
        )
        tx = optax.adamw(1e-4)
        mesh = make_mesh(axis_shapes=(8,), axis_names=("data",))

        state = create_train_state(
            model, batch, jax.random.PRNGKey(0), tx, ema_momentum=0.99
        )
        shardings = fsdp_state_shardings(state, mesh, min_size=1024)
        state_sh = jax.tree_util.tree_map(jax.device_put, state, shardings)

        # donate=False: the replicated reference step below reuses `state`,
        # whose scalar leaves may share buffers with the sharded copy
        step = make_train_step(
            model, tx, ema_momentum=0.99, mesh=mesh,
            state_shardings=shardings, donate=False,
        )
        sb = shard_batch(batch, mesh)
        new_state, metrics = step(state_sh, sb, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))

        # the big WaveNet params must actually be sharded after the step
        flat = jax.tree_util.tree_leaves_with_path(new_state.params)
        sharded = [
            (path, leaf)
            for path, leaf in flat
            if leaf.size >= 1024
            and any(s is not None for s in leaf.sharding.spec)
        ]
        assert sharded, "no parameter ended up sharded"
        for _, leaf in sharded:
            shard_shape = leaf.sharding.shard_shape(leaf.shape)
            assert np.prod(shard_shape) == leaf.size // 8

        # optimizer moments carry the same property
        mu_leaves = [
            leaf
            for leaf in jax.tree_util.tree_leaves(new_state.opt_state)
            if hasattr(leaf, "sharding") and leaf.size >= 1024
        ]
        assert any(
            any(s is not None for s in leaf.sharding.spec) for leaf in mu_leaves
        )

        # numerics match a fully-replicated step
        step_rep = make_train_step(
            model, tx, ema_momentum=0.99, mesh=mesh, donate=False
        )
        ref_state, ref_metrics = step_rep(state, sb, jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
        )


class TestTrainerFsdpConfig:
    def test_fit_with_fsdp_flag(self, tmp_path):
        """trainer.fsdp=True drives the sharded-state path through the real
        Trainer loop (fit -> checkpoint)."""
        from test_trainer import tiny_config

        from fish_diffusion_tpu.datasets import build_loader_from_config
        from fish_diffusion_tpu.training.trainer import Trainer

        cfg = tiny_config(tmp_path)
        cfg.trainer["fsdp"] = True
        cfg.trainer["fsdp_min_size"] = 64  # tiny model: shard small leaves too

        trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
        train_loader, valid_loader = build_loader_from_config(cfg)
        state = trainer.fit(train_loader, valid_loader)

        assert int(state.step) == 3
        n_sharded = sum(
            1
            for leaf in jax.tree_util.tree_leaves(state.params)
            if hasattr(leaf, "sharding")
            and any(s is not None for s in leaf.sharding.spec)
        )
        assert n_sharded > 0
