"""ADaMoS / iSTFTNet vocoder tests + istft round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_diffusion_tpu.ops.mel import istft, stft_magnitude
from fish_diffusion_tpu.models.vocoders.adamos import (
    ADaMoSGenerator,
    ConvNeXtEncoder,
)
from fish_diffusion_tpu.models.vocoders.istft_net import ISTFTNet

torch = pytest.importorskip("torch")


class TestISTFT:
    def test_roundtrip_matches_torch(self):
        """stft -> istft reconstructs and matches torch.istft."""
        rng = np.random.default_rng(0)
        y = rng.standard_normal((1, 4096)).astype(np.float32)
        n_fft, hop = 64, 16

        ty = torch.from_numpy(y)
        spec = torch.stft(
            ty, n_fft, hop_length=hop, win_length=n_fft,
            window=torch.hann_window(n_fft), center=True, return_complex=True,
        )
        real, imag = spec.real.numpy(), spec.imag.numpy()

        with jax.default_matmul_precision("float32"):
            ours = np.asarray(
                istft(jnp.asarray(real), jnp.asarray(imag), n_fft, hop)
            )
        theirs = torch.istft(
            spec, n_fft, hop_length=hop, win_length=n_fft,
            window=torch.hann_window(n_fft),
        ).numpy()

        n = min(ours.shape[-1], theirs.shape[-1])
        np.testing.assert_allclose(
            ours[:, :n], theirs[:, :n], atol=1e-4, rtol=1e-3
        )
        # and it actually reconstructs the signal
        np.testing.assert_allclose(ours[:, 100:n-100], y[:, 100:n-100], atol=1e-4)


class TestConvNeXtEncoder:
    def test_shapes(self):
        enc = ConvNeXtEncoder(
            input_channels=16, depths=(1, 1), dims=(8, 12)
        )
        x = jnp.zeros((1, 20, 16))
        params = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(params, x)
        assert out.shape == (1, 20, 12)


class TestADaMoS:
    def test_generator_tiny(self):
        gen = ADaMoSGenerator(mel_channels=16)
        # shrink by monkeying the submodule configs via a tiny custom build
        from fish_diffusion_tpu.models.vocoders.adamos import (
            ConvNeXtEncoder,
            HiFiGANHead,
        )
        import flax.linen as nn

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, mel):
                h = ConvNeXtEncoder(
                    input_channels=16, depths=(1, 1), dims=(8, 16), name="backbone"
                )(mel)
                return HiFiGANHead(
                    hop_length=64,
                    upsample_rates=(4, 4, 2, 2),
                    upsample_kernel_sizes=(8, 8, 4, 4),
                    resblock_kernel_sizes=(3,),
                    resblock_dilation_sizes=((1, 3, 5),),
                    num_mels=16,
                    upsample_initial_channel=32,
                    name="head",
                )(h)

        m = Tiny()
        mel = jnp.zeros((1, 8, 16))
        params = m.init(jax.random.PRNGKey(0), mel)
        wav = m.apply(params, mel)
        assert wav.shape == (1, 8 * 64)


class TestISTFTNetVocoder:
    def test_end_to_end(self):
        voc = ISTFTNet(
            sampling_rate=44100,
            mel_channels=16,
            hop_length=128,
            gen_istft_n_fft=16,
            gen_istft_hop_size=8,
            upsample_rates=(4, 4),
            upsample_kernel_sizes=(8, 8),
            random_init=True,
        )
        # istft output length: trunk frames scale by istft hop
        mel = jnp.zeros((1, 8, 16))
        f0 = jnp.full((1, 8), 220.0)
        wav = voc.spec2wav(mel[0], f0[0])
        assert wav.ndim == 1 and wav.shape[0] > 0
        assert np.isfinite(np.asarray(wav)).all()
