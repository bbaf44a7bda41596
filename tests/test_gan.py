"""GAN regime tests: discriminators, losses, RefineGAN generator,
HiFiSinger arch, and one full adversarial SPMD step on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fish_diffusion_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    envelope_loss,
    feature_loss,
    generator_adv_loss,
    multi_scale_mel_loss,
)
from fish_diffusion_tpu.models.hifisinger import HiFiSinger
from fish_diffusion_tpu.models.vocoders.refinegan import (
    CombToothGen,
    RefineGANGenerator,
)

T_WAV = 8192


class TestDiscriminators:
    def _wav(self, seed=0):
        return jax.random.normal(jax.random.PRNGKey(seed), (2, T_WAV)) * 0.3

    def test_mpd(self):
        d = MultiPeriodDiscriminator(periods=(2, 3))
        wav = self._wav()
        params = d.init(jax.random.PRNGKey(1), wav)
        scores, fmaps = d.apply(params, wav)
        assert len(scores) == 2 and len(fmaps) == 2
        assert all(s.shape[0] == 2 for s in scores)

    def test_msd(self):
        d = MultiScaleDiscriminator()
        wav = self._wav()
        params = d.init(jax.random.PRNGKey(1), wav)
        scores, fmaps = d.apply(params, wav)
        assert len(scores) == 3
        assert len(fmaps[0]) == 8  # 7 convs + post

    def test_mrd(self):
        d = MultiResolutionDiscriminator(resolutions=((512, 50, 240),))
        wav = self._wav()
        params = d.init(jax.random.PRNGKey(1), wav)
        scores, fmaps = d.apply(params, wav)
        assert len(scores) == 1 and len(fmaps[0]) == 6


class TestLosses:
    def test_lsgan_optimum(self):
        # real=1, fake=0 is the D optimum -> loss 0
        real = [jnp.ones((2, 10))]
        fake = [jnp.zeros((2, 10))]
        assert float(discriminator_loss(real, fake)) == 0.0
        # generator wants fake -> 1
        assert float(generator_adv_loss([jnp.ones((2, 10))])) == 0.0
        assert float(generator_adv_loss([jnp.zeros((2, 10))])) == 1.0

    def test_feature_loss_zero_for_identical(self):
        fmap = [[jnp.ones((2, 4, 4))] * 2]
        assert float(feature_loss(fmap, fmap)) == 0.0

    def test_envelope_loss(self):
        y = jnp.sin(jnp.linspace(0, 100, 4096))[None]
        assert float(envelope_loss(y, y)) == 0.0
        assert float(envelope_loss(y, y * 0.5)) > 0.0

    def test_multi_scale_mel_loss(self):
        y = jax.random.normal(jax.random.PRNGKey(0), (1, 8192)) * 0.3
        loss_same = float(
            multi_scale_mel_loss(y, y, 44100, [(1024, 256, 1024)])
        )
        loss_diff = float(
            multi_scale_mel_loss(y, y * 0.1, 44100, [(1024, 256, 1024)])
        )
        assert loss_same < 1e-6 < loss_diff


class TestRefineGAN:
    def test_combtooth_periodicity(self):
        gen = CombToothGen(sampling_rate=16000, noise_std=0.0)
        f0 = jnp.full((1, 16000, 1), 100.0)  # period 160 samples
        out = gen.apply({}, f0, rngs={"noise": jax.random.PRNGKey(0)})
        s = np.asarray(out[0, :, 0])
        peaks = np.where(s > 0.09)[0]
        assert len(peaks) > 50
        gaps = np.diff(peaks)
        gaps = gaps[gaps > 10]
        np.testing.assert_allclose(np.median(gaps), 160, atol=2)

    def test_generator_shapes(self):
        gen = RefineGANGenerator(
            sampling_rate=44100,
            hop_length=256,
            downsample_rates=(2, 2, 8, 8),
            upsample_rates=(8, 8, 2, 2),
            num_mels=32,
            start_channels=4,
        )
        mel = jnp.zeros((1, 16, 32))
        f0 = jnp.full((1, 16), 220.0)
        variables = gen.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            mel,
            f0,
        )
        wav = gen.apply(variables, mel, f0, rngs={"noise": jax.random.PRNGKey(2)})
        assert wav.shape == (1, 16 * 256)
        assert np.abs(np.asarray(wav)).max() <= 1.0


class TestHiFiSinger:
    def _model(self):
        return HiFiSinger(
            hidden_size=16,
            text_encoder=dict(
                type="NaiveProjectionEncoder", input_size=8, output_size=16
            ),
            speaker_encoder=dict(
                type="NaiveProjectionEncoder",
                input_size=4,
                output_size=16,
                use_embedding=True,
            ),
            encoder=dict(
                type="RefineGAN",
                sampling_rate=44100,
                hop_length=256,
                downsample_rates=(2, 2, 8, 8),
                upsample_rates=(8, 8, 2, 2),
                num_mels=16,
                start_channels=4,
            ),
        )

    def test_forward(self):
        model = self._model()
        B, T = 2, 16
        args = dict(
            speakers=jnp.zeros((B,), jnp.int32),
            contents=jnp.ones((B, T, 8)),
            contents_lens=jnp.full((B,), T, jnp.int32),
            pitches=jnp.full((B, T), 220.0),
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            **args,
        )
        wav = model.apply(variables, **args, rngs={"noise": jax.random.PRNGKey(2)})
        assert wav.shape == (B, T * 256)


class TestGANTrainStep:
    def test_full_adversarial_step_on_mesh(self):
        from fish_diffusion_tpu.parallel import make_mesh, shard_batch
        from fish_diffusion_tpu.training.gan import (
            Discriminators,
            create_gan_state,
            make_gan_train_step,
        )

        gen = RefineGANGenerator(
            sampling_rate=44100,
            hop_length=256,
            downsample_rates=(2, 2, 8, 8),
            upsample_rates=(8, 8, 2, 2),
            num_mels=8,
            start_channels=2,
        )

        B, T = 8, 16
        mel = jnp.zeros((B, T, 8))
        f0 = jnp.full((B, T), 220.0)
        variables = gen.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            mel[:1],
            f0[:1],
        )

        def generator_apply(params, batch, rng):
            return gen.apply(
                {"params": params}, batch["mel"], batch["pitches"],
                rngs={"noise": rng},
            )

        discs = Discriminators(
            "v2",
            mpd_cfg={"periods": (2, 3)},
            mrd_cfg={"resolutions": ((512, 50, 240),)},
        )

        tx_g = optax.adam(1e-4)
        tx_d = optax.adam(1e-4)
        wav_example = jnp.zeros((1, T * 256))
        state = create_gan_state(
            lambda: variables["params"], discs, wav_example,
            jax.random.PRNGKey(5), tx_g, tx_d,
        )

        mesh = make_mesh(axis_shapes=(8,), axis_names=("data",))
        step = make_gan_train_step(
            generator_apply, discs, tx_g, tx_d,
            sampling_rate=44100,
            multi_scale_mels=((512, 128, 512),),
            mesh=mesh,
        )

        batch = {
            "mel": mel,
            "pitches": f0,
            "audio": jax.random.normal(jax.random.PRNGKey(9), (B, T * 256)) * 0.1,
        }
        batch = shard_batch(batch, mesh)
        state, metrics = step(state, batch, jax.random.PRNGKey(11))

        assert int(state.step) == 1
        for k in ("loss_d", "loss_g", "loss_mel", "loss_env", "loss_adv"):
            assert np.isfinite(float(metrics[k])), k


class TestDiscriminatorGradientSafety:
    def test_mrd_grad_finite_at_silent_input(self):
        """sqrt(re^2+im^2) has a NaN gradient at exactly-zero STFT bins;
        the MRD must stay differentiable on silent generated audio (the
        r2 GAN proof-run NaN'd through this path before the eps fix)."""
        import jax
        import jax.numpy as jnp

        from fish_diffusion_tpu.models.discriminators import (
            MultiResolutionDiscriminator,
        )

        mrd = MultiResolutionDiscriminator()
        wav = jnp.zeros((1, 8192))
        params = mrd.init(jax.random.PRNGKey(0), wav)["params"]

        def loss(w):
            scores, _ = mrd.apply({"params": params}, w)
            return sum(jnp.mean((s - 1.0) ** 2) for s in scores)

        g = jax.grad(loss)(wav)
        assert bool(jnp.isfinite(g).all()), "NaN grad at silent input"


class TestBlockedMSD:
    """Blocked grouped DiscriminatorS (blocked=True, the default) == plain:
    same param tree, same scores/fmaps — incl. the odd-length pooled
    scales (T/2+1) that exercise the pad-and-trim path."""

    @pytest.mark.parametrize("t_wav", [8192, 4097])
    def test_blocked_matches_plain(self, t_wav):
        import jax.tree_util as jtu

        from fish_diffusion_tpu.models.discriminators import DiscriminatorS

        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, t_wav)) * 0.1,
            jnp.float32,
        )
        dp = DiscriminatorS(blocked=False)
        db = DiscriminatorS(blocked=True)
        v = jax.jit(dp.init)(jax.random.PRNGKey(0), x)
        vb = jax.eval_shape(lambda: db.init(jax.random.PRNGKey(0), x))
        assert jtu.tree_structure(v) == jtu.tree_structure(vb)
        assert all(
            a.shape == b.shape
            for a, b in zip(jtu.tree_leaves(v), jtu.tree_leaves(vb))
        )

        s0, f0 = jax.jit(dp.apply)(v, x)
        s1, f1 = jax.jit(db.apply)(v, x)
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), atol=2e-5, rtol=1e-4
        )
        for a, b in zip(f0, f1):
            assert a.shape == b.shape
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
            )


class TestBlockedMRD:
    """Space-to-depth DiscriminatorR (blocked=True, the default) ==
    plain path: same param tree, same scores and fmaps."""

    def test_blocked_matches_plain(self):
        import jax.tree_util as jtu

        from fish_diffusion_tpu.models.discriminators import DiscriminatorR

        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 8192)) * 0.1,
            jnp.float32,
        )
        dp = DiscriminatorR(1024, 120, 600, blocked=False)
        db = DiscriminatorR(1024, 120, 600, blocked=True)
        v = jax.jit(dp.init)(jax.random.PRNGKey(0), x)
        vb = jax.eval_shape(lambda: db.init(jax.random.PRNGKey(0), x))
        assert jtu.tree_structure(v) == jtu.tree_structure(vb)
        assert all(
            a.shape == b.shape
            for a, b in zip(jtu.tree_leaves(v), jtu.tree_leaves(vb))
        )

        s0, f0 = dp.apply(v, x)
        s1, f1 = db.apply(v, x)
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), atol=2e-5, rtol=1e-4
        )
        for a, b in zip(f0, f1):
            assert a.shape == b.shape
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
            )
