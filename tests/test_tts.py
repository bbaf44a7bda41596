"""GradTTS + LlamaDenoiser tests (token-conditioned diffusion)."""

import jax
import jax.numpy as jnp
import numpy as np

from fish_diffusion_tpu.models.grad_tts import GradTTS
from fish_diffusion_tpu.models.llama import LlamaBlock, LlamaDenoiser, RMSNorm

B, T_MEL, T_TOK, MEL = 2, 16, 6, 8


class TestLlamaPieces:
    def test_rmsnorm(self):
        norm = RMSNorm()
        x = jnp.ones((2, 4, 8)) * 3.0
        params = norm.init(jax.random.PRNGKey(0), x)
        out = np.asarray(norm.apply(params, x))
        np.testing.assert_allclose(out, 1.0, atol=1e-5)  # unit RMS

    def test_block_shapes(self):
        blk = LlamaBlock(hidden_size=16, num_heads=2, intermediate_size=32)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, 10, 16))
        pos = jnp.arange(10)
        params = blk.init(jax.random.PRNGKey(1), x, pos)
        out = blk.apply(params, x, pos)
        assert out.shape == x.shape


class TestLlamaDenoiser:
    def _model(self):
        return LlamaDenoiser(
            diffusion_channels=MEL,
            hidden_size=16,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=32,
            vocab_size=50,
        )

    def test_forward(self):
        model = self._model()
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T_MEL, MEL))
        tokens = jnp.ones((B, T_TOK), jnp.int32)
        t = jnp.array([3.0, 40.0])
        params = model.init(jax.random.PRNGKey(1), x, t, tokens)
        out = model.apply(params, x, t, tokens)
        assert out.shape == (B, T_MEL, MEL)
        assert np.isfinite(np.asarray(out)).all()

    def test_mask_handling(self):
        model = self._model()
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T_MEL, MEL))
        tokens = jnp.ones((B, T_TOK), jnp.int32)
        t = jnp.array([3.0, 40.0])
        x_masks = jnp.zeros((B, T_MEL), bool).at[:, -4:].set(True)
        cond_masks = jnp.zeros((B, T_TOK), bool).at[:, -2:].set(True)
        params = model.init(jax.random.PRNGKey(1), x, t, tokens)
        out = model.apply(
            params, x, t, tokens, x_masks=x_masks, cond_masks=cond_masks
        )
        assert out.shape == (B, T_MEL, MEL)


class TestGradTTS:
    def test_train_and_sample(self):
        arch = GradTTS(
            diffusion=dict(
                type="GaussianDiffusion",
                mel_channels=MEL,
                timesteps=10,
                sampler_interval=2,
                denoiser=dict(
                    type="LlamaDenoiser",
                    diffusion_channels=MEL,
                    hidden_size=16,
                    num_hidden_layers=1,
                    num_attention_heads=2,
                    intermediate_size=32,
                    vocab_size=50,
                ),
                spec_min=[-1],
                spec_max=[1],
            ),
        )
        tokens = jnp.ones((B, T_TOK), jnp.int32)
        mel = jax.random.uniform(jax.random.PRNGKey(0), (B, T_MEL, MEL), minval=-1)
        lens = jnp.array([T_MEL, T_MEL - 4])

        variables = arch.init(
            {"params": jax.random.PRNGKey(1), "diffusion": jax.random.PRNGKey(2)},
            speakers=None,
            contents=tokens,
            contents_lens=jnp.array([T_TOK, T_TOK - 2]),
            mel=mel,
            mel_lens=lens,
        )
        out = arch.apply(
            variables,
            speakers=None,
            contents=tokens,
            contents_lens=jnp.array([T_TOK, T_TOK - 2]),
            mel=mel,
            mel_lens=lens,
            rngs={"diffusion": jax.random.PRNGKey(3)},
        )
        assert np.isfinite(float(out["loss"]))

        sampled = arch.apply(
            variables,
            speakers=None,
            contents=tokens,
            contents_lens=jnp.array([T_TOK, T_TOK - 2]),
            mel_lens=lens,
            mel_max_len=T_MEL,
            method=arch.sample,
            rngs={"diffusion": jax.random.PRNGKey(4)},
        )
        assert sampled.shape == (B, T_MEL, MEL)
