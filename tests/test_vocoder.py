"""NSF-HiFiGAN vocoder tests: torch conv/transpose parity (the contract that
makes checkpoint conversion exact), sine-source phase accuracy, generator
shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_diffusion_tpu.models.vocoders.nsf_hifigan import (
    Conv1d,
    NsfHifiGAN,
    NsfHifiGANGenerator,
    SineGen,
    _mod1_phase_scan,
)

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def full_precision():
    """XLA default conv/dot precision is below f32; parity tests compare
    against torch f32, so force full precision here."""
    with jax.default_matmul_precision("float32"):
        yield


class TestConvParity:
    def test_conv1d_matches_torch(self):
        """channels-last flax conv == torch Conv1d given transposed weights."""
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 50, 8)).astype(np.float32)

        mod = Conv1d(features=16, kernel_size=7, dilation=1)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = np.asarray(mod.apply(params, jnp.asarray(x)))

        w = np.asarray(params["params"]["Conv_0"]["kernel"])  # [k, in, out]
        b = np.asarray(params["params"]["Conv_0"]["bias"])

        tconv = torch.nn.Conv1d(8, 16, 7, padding=3)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
            tconv.bias.copy_(torch.from_numpy(b))
            theirs = tconv(torch.from_numpy(x.transpose(0, 2, 1)))
        theirs = theirs.numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-4)

    def test_dilated_conv_matches_torch(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 64, 4)).astype(np.float32)

        mod = Conv1d(features=4, kernel_size=3, dilation=5)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = np.asarray(mod.apply(params, jnp.asarray(x)))

        w = np.asarray(params["params"]["Conv_0"]["kernel"])
        b = np.asarray(params["params"]["Conv_0"]["bias"])
        tconv = torch.nn.Conv1d(4, 4, 3, padding=5, dilation=5)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
            tconv.bias.copy_(torch.from_numpy(b))
            theirs = tconv(torch.from_numpy(x.transpose(0, 2, 1)))
        theirs = theirs.numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-4)

    @pytest.mark.parametrize("k,u", [(16, 8), (4, 2)])
    def test_convtranspose_matches_torch(self, k, u):
        """flax ConvTranspose(transpose_kernel=True) == torch ConvTranspose1d
        with padding (k-u)//2 — the upsampler contract for ckpt conversion."""
        import flax.linen as nn

        rng = np.random.default_rng(2)
        cin, cout, T = 6, 4, 20
        x = rng.standard_normal((1, T, cin)).astype(np.float32)

        pad = (k - u) // 2
        mod = nn.ConvTranspose(
            cout,
            kernel_size=(k,),
            strides=(u,),
            padding=[(k - 1 - pad, k - 1 - pad)],
            transpose_kernel=True,
        )
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = np.asarray(mod.apply(params, jnp.asarray(x)))
        assert ours.shape == (1, T * u, cout)

        w = np.asarray(params["params"]["kernel"])  # [k, out, in] w/ transpose_kernel
        b = np.asarray(params["params"]["bias"])
        tconv = torch.nn.ConvTranspose1d(cin, cout, k, stride=u, padding=pad)
        with torch.no_grad():
            # torch weight: [in, out, k]
            tconv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
            tconv.bias.copy_(torch.from_numpy(b))
            theirs = tconv(torch.from_numpy(x.transpose(0, 2, 1)))
        theirs = theirs.numpy().transpose(0, 2, 1)
        assert theirs.shape == ours.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-4)


class TestSineSource:
    def test_phase_scan_exactness(self):
        """associative mod-1 scan == float64 cumsum mod 1, even at lengths
        where float32 cumsum has lost all fractional precision."""
        rng = np.random.default_rng(3)
        rad = rng.uniform(0, 0.3, (1, 400_000, 1)).astype(np.float32)

        ours = np.asarray(_mod1_phase_scan(jnp.asarray(rad)))[0, :, 0]
        exact = np.mod(np.cumsum(rad[0, :, 0].astype(np.float64)), 1.0)

        # compare on the circle (distance mod 1)
        d = np.abs(ours - exact)
        d = np.minimum(d, 1 - d)
        assert d.max() < 1e-2  # float32 raw cumsum would be ~O(1) wrong here

        naive = np.mod(np.cumsum(rad[0, :, 0]), 1.0)
        d_naive = np.abs(naive - exact)
        d_naive = np.minimum(d_naive, 1 - d_naive)
        assert d_naive.max() > d.max()  # we strictly beat the naive cumsum

    def test_sinegen_shapes_and_uv(self):
        gen = SineGen(samp_rate=44100, harmonic_num=8)
        f0 = jnp.concatenate(
            [jnp.zeros((1, 100, 1)), jnp.full((1, 100, 1), 220.0)], axis=1
        )
        sines, uv, noise = gen.apply(
            {}, f0, rngs={"noise": jax.random.PRNGKey(0)}
        )
        assert sines.shape == (1, 200, 9)
        np.testing.assert_array_equal(np.asarray(uv[0, :100, 0]), 0.0)
        np.testing.assert_array_equal(np.asarray(uv[0, 100:, 0]), 1.0)
        # voiced region: dominated by the sine (amplitude ~0.1)
        assert 0.05 < np.abs(np.asarray(sines[0, 100:, 0])).max() <= 0.15

    def test_sine_frequency(self):
        """Fundamental component should oscillate at f0."""
        sr, f = 16000, 440.0
        gen = SineGen(samp_rate=sr, harmonic_num=0, noise_std=0.0)
        f0 = jnp.full((1, sr, 1), f)
        sines, _, _ = gen.apply({}, f0, rngs={"noise": jax.random.PRNGKey(0)})
        s = np.asarray(sines[0, :, 0])
        # count zero crossings: 2 per cycle
        crossings = np.sum(np.abs(np.diff(np.signbit(s))))
        cycles = crossings / 2
        assert abs(cycles - f) / f < 0.02


class TestGenerator:
    def test_output_length(self):
        gen = NsfHifiGANGenerator(
            num_mels=16,
            sampling_rate=44100,
            hop_size=64,
            upsample_rates=(4, 4, 2, 2),
            upsample_kernel_sizes=(8, 8, 4, 4),
            upsample_initial_channel=32,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),),
        )
        mel = jnp.zeros((1, 10, 16))
        f0 = jnp.full((1, 10), 220.0)
        variables = gen.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            mel,
            f0,
        )
        wav = gen.apply(variables, mel, f0, rngs={"noise": jax.random.PRNGKey(2)})
        assert wav.shape == (1, 640)
        assert np.abs(np.asarray(wav)).max() <= 1.0

    def test_wrapper_roundtrip_shapes(self):
        voc = NsfHifiGAN(
            sampling_rate=44100,
            mel_channels=128,
            hop_length=512,
            use_natural_log=False,
        )
        voc.generator = NsfHifiGANGenerator(
            num_mels=128,
            sampling_rate=44100,
            hop_size=512,
            upsample_rates=(8, 8, 2, 2, 2),
            upsample_kernel_sizes=(16, 16, 4, 4, 4),
            upsample_initial_channel=64,
        )
        voc.init_random(jax.random.PRNGKey(0))

        audio = jnp.asarray(
            np.random.default_rng(5).uniform(-0.5, 0.5, (1, 512 * 20)).astype(
                np.float32
            )
        )
        mel = voc.wav2spec(audio)
        assert mel.shape == (1, 20, 128)
        wav = voc.spec2wav(mel, jnp.full((1, 20), 220.0))
        assert wav.shape == (1, 512 * 20)


class TestBlockedTail:
    """Space-to-depth resblock compute (NsfHifiGANGenerator.blocked_tail):
    identical param tree and identical math to the plain conv path."""

    def test_blocked_matches_plain(self):
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.uniform(-4, 0, (2, 16, 128)), jnp.float32)
        f0 = jnp.asarray(rng.uniform(80, 600, (2, 16)), jnp.float32)
        kw = dict(
            num_mels=128,
            sampling_rate=44100,
            hop_size=512,
            upsample_rates=(8, 8, 2, 2, 2),
            upsample_kernel_sizes=(16, 16, 4, 4, 4),
            upsample_initial_channel=128,  # tail levels C=64/32/16/8/4
        )
        g_plain = NsfHifiGANGenerator(**kw, blocked_tail=False)
        g_block = NsfHifiGANGenerator(**kw, blocked_tail=True)

        keys = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
        v = jax.jit(g_plain.init)(keys, mel, f0)
        vb = jax.eval_shape(lambda: g_block.init(keys, mel, f0))

        import jax.tree_util as jtu

        assert jtu.tree_structure(v) == jtu.tree_structure(vb)
        assert all(
            a.shape == b.shape
            for a, b in zip(jtu.tree_leaves(v), jtu.tree_leaves(vb))
        )

        noise = {"noise": jax.random.PRNGKey(2)}
        y_plain = g_plain.apply(v, mel, f0, rngs=noise)
        y_block = g_block.apply(v, mel, f0, rngs=noise)
        np.testing.assert_allclose(
            np.asarray(y_plain), np.asarray(y_block), atol=2e-5, rtol=1e-4
        )

    def test_blocked_gradients_flow(self):
        """GAN training runs through the blocked path; grads must match the
        plain path (same params, same loss surface)."""
        rng = np.random.default_rng(1)
        mel = jnp.asarray(rng.uniform(-4, 0, (1, 8, 128)), jnp.float32)
        f0 = jnp.asarray(rng.uniform(80, 600, (1, 8)), jnp.float32)
        kw = dict(
            num_mels=128,
            sampling_rate=44100,
            hop_size=512,
            upsample_rates=(8, 8, 2, 2, 2),
            upsample_kernel_sizes=(16, 16, 4, 4, 4),
            upsample_initial_channel=64,
        )
        g_plain = NsfHifiGANGenerator(**kw, blocked_tail=False)
        g_block = NsfHifiGANGenerator(**kw, blocked_tail=True)
        keys = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
        v = jax.jit(g_plain.init)(keys, mel, f0)

        def loss(params, g):
            wav = g.apply(
                {"params": params}, mel, f0, rngs={"noise": jax.random.PRNGKey(2)}
            )
            return jnp.mean(wav**2)

        gp = jax.grad(loss)(v["params"], g_plain)
        gb = jax.grad(loss)(v["params"], g_block)
        flat_p = jax.tree_util.tree_leaves(gp)
        flat_b = jax.tree_util.tree_leaves(gb)
        for a, b in zip(flat_p, flat_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
            )
