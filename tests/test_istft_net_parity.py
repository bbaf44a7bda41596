"""True numerical parity: reference torch iSTFTNet generator (NSF trunk +
spec/phase head) -> NSF converter -> flax ISTFTNetGenerator."""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

NSF = Path("/root/reference/fish_diffusion/modules/vocoders/nsf_hifigan/models.py")
REF = Path("/root/reference/fish_diffusion/modules/vocoders/istft_net/models.py")


def load_reference():
    names = [
        "fish_diffusion",
        "fish_diffusion.modules",
        "fish_diffusion.modules.vocoders",
        "fish_diffusion.modules.vocoders.nsf_hifigan",
    ]
    for n in names:
        if n not in sys.modules:
            pkg = types.ModuleType(n)
            pkg.__path__ = []
            sys.modules[n] = pkg
    spec = importlib.util.spec_from_file_location(
        "fish_diffusion.modules.vocoders.nsf_hifigan.models", NSF
    )
    nsf = importlib.util.module_from_spec(spec)
    sys.modules["fish_diffusion.modules.vocoders.nsf_hifigan.models"] = nsf
    spec.loader.exec_module(nsf)

    spec = importlib.util.spec_from_file_location("ref_istft_models", REF)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return nsf, m


def _load_tool(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    not (REF.exists() and NSF.exists()), reason="reference repo not mounted"
)
def test_converted_istft_net_matches_torch(monkeypatch):
    nsf, ref = load_reference()

    h = nsf.AttrDict(
        num_mels=16,
        sampling_rate=44100,
        hop_size=16,
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=32,
        resblock="1",
        resblock_kernel_sizes=[3, 7],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
        gen_istft_n_fft=16,
        gen_istft_hop_size=4,
    )
    # latent upstream incompatibility: istft_net/models.py:15 reads
    # ResBlock1.out_channels, which nsf_hifigan/models.py's ResBlock1 never
    # defines — supply the intended value so the reference constructs
    monkeypatch.setattr(
        nsf.ResBlock1,
        "out_channels",
        property(lambda self: self.convs2[0].out_channels),
        raising=False,
    )
    torch.manual_seed(0)
    tgen = ref.Generator(h)
    # same upstream rot: forward reads self.post_n_fft, never set
    tgen.post_n_fft = h.gen_istft_n_fft
    tgen.eval()

    # zero every noise draw on both frameworks
    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.zeros(*a, **k))
    monkeypatch.setattr(torch, "randn_like", lambda x, **k: torch.zeros_like(x))
    monkeypatch.setattr(
        jax.random, "uniform", lambda key, shape=(), **k: jnp.zeros(shape)
    )
    monkeypatch.setattr(
        jax.random,
        "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
    )

    n_frames = 12
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 16, n_frames)).astype(np.float32)
    f0 = (220.0 + 40.0 * np.sin(np.linspace(0, 3, n_frames))).astype(
        np.float32
    )[None]

    with torch.no_grad():
        t_spec, t_phase = tgen(torch.from_numpy(mel), torch.from_numpy(f0))
        t_spec, t_phase = t_spec.numpy(), t_phase.numpy()

    convert = _load_tool(
        "/root/repo/tools/nsf_hifigan/convert_checkpoint.py", "nsf_convert2"
    ).convert

    sd = {k: v.numpy() for k, v in tgen.state_dict().items()}
    params = convert(sd, n_ups=2)

    from fish_diffusion_tpu.models.vocoders.istft_net import ISTFTNetGenerator

    jgen = ISTFTNetGenerator(
        num_mels=16,
        sampling_rate=44100,
        hop_size=16,
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5),) * 2,
        gen_istft_n_fft=16,
        gen_istft_hop_size=4,
    )
    j_spec, j_phase = jgen.apply(
        {"params": params},
        jnp.asarray(mel.transpose(0, 2, 1)),
        jnp.asarray(f0),
        rngs={"noise": jax.random.PRNGKey(0)},
    )

    np.testing.assert_allclose(np.asarray(j_spec), t_spec, atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_phase), t_phase, atol=5e-5, rtol=1e-3)
