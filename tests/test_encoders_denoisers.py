"""Tests for the encoder stable + ConvNext/Transformer denoisers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_diffusion_tpu.models.convnext import (
    ConvNext,
    DepthwiseConv7,
    TransformerDecoderDenoiser,
)
from fish_diffusion_tpu.models.encoders import (
    NaiveProjectionEncoder,
    QuantizedPitchEncoder,
    TransformerEncoder,
)
from fish_diffusion_tpu.models.fast_speech import (
    FastSpeech2Encoder,
    interleaved_positions,
)

B, T, MEL, COND = 2, 64, 16, 24


class TestDepthwiseConv7:
    @pytest.mark.parametrize("dilation", [1, 2, 4])
    def test_matches_lax_depthwise(self, dilation):
        feats = 8
        mod = DepthwiseConv7(feats)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, feats))
        params = mod.init(jax.random.PRNGKey(1), x, jnp.int32(dilation))
        ours = mod.apply(params, x, jnp.int32(dilation))

        k = np.asarray(params["params"]["kernel"])  # [7, C]
        b = np.asarray(params["params"]["bias"])
        # depthwise conv via lax: feature_group_count = C, kernel [7, 1, C]
        theirs = jax.lax.conv_general_dilated(
            x,
            jnp.asarray(k[:, None, :]),
            window_strides=(1,),
            padding=[(3 * dilation, 3 * dilation)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=feats,
        ) + b
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(theirs), atol=1e-5, rtol=1e-5
        )


class TestStaticVsTracedDilationShifts:
    """The two dilation-shift lowerings (static lax.switch = train regime,
    traced roll+mask = inference regime; selected by
    ``build_model(training=...)``) must share one param tree and produce
    identical outputs — checkpoints move freely between regimes."""

    @pytest.mark.parametrize("arch", ["wavenet", "convnext"])
    def test_same_params_same_outputs(self, arch):
        from fish_diffusion_tpu.models.wavenet import WaveNet

        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, MEL))
        cond = jax.random.normal(jax.random.PRNGKey(1), (B, T, COND))
        t = jnp.array([5, 500], jnp.int32)

        def build(static):
            if arch == "wavenet":
                return WaveNet(
                    mel_channels=MEL,
                    d_encoder=COND,
                    residual_channels=16,
                    residual_layers=8,
                    dilation_cycle=4,
                    static_dilation_shifts=static,
                )
            return ConvNext(
                mel_channels=MEL,
                dim=16,
                condition_dim=COND,
                num_layers=8,
                dilation_cycle=4,
                static_dilation_shifts=static,
            )

        m_static, m_traced = build(True), build(False)
        params = m_traced.init(jax.random.PRNGKey(2), x, t, cond)["params"]
        init_s = m_static.init(jax.random.PRNGKey(2), x, t, cond)["params"]
        assert jax.tree_util.tree_map(jnp.shape, params) == (
            jax.tree_util.tree_map(jnp.shape, init_s)
        )
        out_t = m_traced.apply({"params": params}, x, t, cond)
        out_s = m_static.apply({"params": params}, x, t, cond)
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_t), atol=1e-5, rtol=1e-5
        )

    def test_build_model_training_flag_injects(self):
        from fish_diffusion_tpu.models import build_model

        cfg = dict(
            type="DiffSinger",
            diffusion=dict(
                type="GaussianDiffusion",
                mel_channels=MEL,
                noise_schedule="linear",
                timesteps=50,
                denoiser=dict(
                    type="WaveNetDenoiser",
                    mel_channels=MEL,
                    d_encoder=COND,
                    residual_channels=16,
                    residual_layers=4,
                    dilation_cycle=2,
                ),
                spec_min=[-5],
                spec_max=[0],
            ),
            text_encoder=dict(
                type="NaiveProjectionEncoder",
                input_size=COND,
                output_size=COND,
            ),
        )
        trained = build_model(cfg, training=True)
        served = build_model(cfg)
        assert trained.diffusion["denoiser"]["static_dilation_shifts"] is True
        assert "static_dilation_shifts" not in served.diffusion["denoiser"]


class TestConvNextDenoiser:
    def _io(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, MEL))
        cond = jax.random.normal(jax.random.PRNGKey(1), (B, T, COND))
        t = jnp.array([5.0, 500.0])
        return x, t, cond

    def test_forward_shape(self):
        model = ConvNext(
            mel_channels=MEL, dim=32, condition_dim=COND, num_layers=4,
            dilation_cycle=2,
        )
        x, t, cond = self._io()
        params = model.init(jax.random.PRNGKey(2), x, t, cond)
        out = model.apply(params, x, t, cond)
        assert out.shape == (B, T, MEL)
        assert np.isfinite(np.asarray(out)).all()
        # scanned stack: stacked params leading dim == num_layers
        stacked = params["params"]["residual_layers"]["block"]["dwconv"]["kernel"]
        assert stacked.shape[0] == 4

    def test_cross_attention_variant(self):
        model = ConvNext(
            mel_channels=MEL, dim=32, condition_dim=COND, num_layers=4,
            dilation_cycle=2, cross_attention=True, cross_every_n_layers=2,
        )
        x, t, cond = self._io()
        params = model.init(jax.random.PRNGKey(2), x, t, cond)
        out = model.apply(params, x, t, cond)
        assert out.shape == (B, T, MEL)

    def test_mask_zeroes_padding(self):
        model = ConvNext(
            mel_channels=MEL, dim=32, condition_dim=COND, num_layers=2,
            dilation_cycle=2,
        )
        x, t, cond = self._io()
        masks = jnp.zeros((B, T), bool).at[:, T // 2 :].set(True)
        params = model.init(jax.random.PRNGKey(2), x, t, cond)
        out = model.apply(params, x, t, cond, x_masks=masks)
        np.testing.assert_allclose(np.asarray(out[:, T // 2 :]), 0.0, atol=1e-6)


class TestTransformerDenoiser:
    def test_forward_shape(self):
        model = TransformerDecoderDenoiser(
            mel_channels=MEL, dim=32, condition_dim=COND, num_layers=2
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, MEL))
        cond = jax.random.normal(jax.random.PRNGKey(1), (B, T, COND))
        t = jnp.array([5.0, 500.0])
        params = model.init(jax.random.PRNGKey(2), x, t, cond)
        out = model.apply(params, x, t, cond)
        assert out.shape == (B, T, MEL)
        assert np.isfinite(np.asarray(out)).all()


class TestFastSpeech2Encoder:
    def test_positions_table(self):
        pe = interleaved_positions(8, 4)
        assert pe.shape == (8, 4)
        np.testing.assert_allclose(pe[0, 0], 0.0, atol=1e-7)  # sin(0)
        np.testing.assert_allclose(pe[0, 1], 1.0, atol=1e-7)  # cos(0)
        rev = interleaved_positions(8, 4, reverse=True)
        np.testing.assert_allclose(rev[-1], pe[0], atol=1e-7)

    def test_forward_dense(self):
        enc = FastSpeech2Encoder(
            input_size=32, hidden_size=16, num_layers=2, num_heads=2
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 32))
        mask = jnp.zeros((B, T), bool).at[:, T - 8 :].set(True)
        params = enc.init(jax.random.PRNGKey(1), x, mask)
        out = enc.apply(params, x, mask)
        assert out.shape == (B, T, 16)
        np.testing.assert_allclose(np.asarray(out[:, T - 8 :]), 0.0, atol=1e-6)

    def test_forward_embedding(self):
        enc = FastSpeech2Encoder(
            input_size=100,
            hidden_size=16,
            num_layers=1,
            use_embedding_to_input=True,
        )
        ids = jnp.ones((B, T), jnp.int32)
        params = enc.init(jax.random.PRNGKey(1), ids, None)
        out = enc.apply(params, ids, None)
        assert out.shape == (B, T, 16)


class TestEncoders:
    def test_naive_projection_linear(self):
        enc = NaiveProjectionEncoder(input_size=8, output_size=4)
        x = jnp.ones((B, T, 8))
        params = enc.init(jax.random.PRNGKey(0), x)
        assert enc.apply(params, x).shape == (B, T, 4)

    def test_naive_projection_embedding(self):
        enc = NaiveProjectionEncoder(input_size=10, output_size=4, use_embedding=True)
        x = jnp.array([1, 5])
        params = enc.init(jax.random.PRNGKey(0), x)
        assert enc.apply(params, x).shape == (2, 4)

    def test_naive_projection_preprocessing(self):
        enc = NaiveProjectionEncoder(
            input_size=1, output_size=4, preprocessing="pitch_to_scale"
        )
        f0 = jnp.full((B, T), 440.0)  # [B, T] -> preprocessed to [B, T, 1]
        params = enc.init(jax.random.PRNGKey(0), f0)
        assert enc.apply(params, f0).shape == (B, T, 4)

    def test_quantized_pitch_encoder(self):
        enc = QuantizedPitchEncoder(output_size=8)
        f0 = jnp.full((B, T), 220.0)
        params = enc.init(jax.random.PRNGKey(0), f0)
        out = enc.apply(params, f0)
        assert out.shape == (B, T, 8)

    def test_transformer_encoder(self):
        enc = TransformerEncoder(input_size=8, output_size=16, num_layers=2)
        x = jnp.ones((B, T, 8))
        mask = jnp.zeros((B, T), bool)
        params = enc.init(jax.random.PRNGKey(0), x, mask)
        assert enc.apply(params, x, mask).shape == (B, T, 16)


class TestWaveNetRemat:
    """remat / remat_policy change the backward schedule only: params,
    outputs, and grads must match the plain-autodiff WaveNet exactly."""

    def _grads(self, **kw):
        from fish_diffusion_tpu.models.wavenet import WaveNet

        net = WaveNet(
            mel_channels=MEL, d_encoder=COND, residual_channels=8,
            residual_layers=4, dilation_cycle=4, use_linear_bias=True,
            static_dilation_shifts=True, **kw,
        )
        x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, MEL)), jnp.float32)
        cond = jnp.asarray(np.random.default_rng(1).standard_normal((B, T, COND)), jnp.float32)
        step = jnp.array([3, 40], jnp.int32)
        params = net.init(jax.random.PRNGKey(0), x, step, cond)["params"]

        def loss(p):
            return jnp.mean(net.apply({"params": p}, x, step, cond) ** 2)

        val, grads = jax.jit(jax.value_and_grad(loss))(params)
        return params, float(val), grads

    @pytest.mark.parametrize(
        "kw",
        [dict(remat=True), dict(remat=True, remat_policy="dots_saveable")],
        ids=["full", "dots_saveable"],
    )
    def test_remat_matches_plain_autodiff(self, kw):
        p0, v0, g0 = self._grads(remat=False)
        p1, v1, g1 = self._grads(**kw)
        # identical param tree (checkpoints interchangeable)
        assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
        assert np.isclose(v0, v1, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)

    def test_unknown_policy_fails_loudly(self):
        with pytest.raises(AttributeError):
            self._grads(remat=True, remat_policy="not_a_policy")
