"""True numerical parity: random torch NSF-HiFiGAN Generator (the reference
implementation loaded standalone) -> checkpoint converter -> flax generator,
same input -> same waveform.

Noise sources (sine-gen initial phase + additive noise) are zeroed on both
sides so the comparison is deterministic.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = Path("/root/reference/fish_diffusion/modules/vocoders/nsf_hifigan/models.py")


def load_reference_models():
    spec = importlib.util.spec_from_file_location("ref_nsf_models", REF)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _load_tool(path, name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
def test_converted_generator_matches_torch(monkeypatch):
    ref = load_reference_models()

    h = ref.AttrDict(
        num_mels=16,
        sampling_rate=44100,
        hop_size=64,
        upsample_rates=[4, 4, 2, 2],
        upsample_kernel_sizes=[8, 8, 4, 4],
        upsample_initial_channel=32,
        resblock="1",
        resblock_kernel_sizes=[3, 7],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
    )

    torch.manual_seed(0)
    tgen = ref.Generator(h)
    tgen.eval()

    # deterministic: zero all noise draws on both frameworks
    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.zeros(*a, **k))
    monkeypatch.setattr(
        torch, "randn_like", lambda x, **k: torch.zeros_like(x)
    )
    real_uniform, real_normal = jax.random.uniform, jax.random.normal
    monkeypatch.setattr(
        jax.random, "uniform", lambda key, shape=(), **k: jnp.zeros(shape)
    )
    monkeypatch.setattr(
        jax.random,
        "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
    )

    n_frames = 12
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 16, n_frames)).astype(np.float32)
    # VARYING f0: exercises the frame->sample upsampling convention
    # (reference f0_upsamp = nn.Upsample default nearest, models.py:359)
    f0 = (220.0 + 40.0 * np.sin(np.linspace(0, 3, n_frames))).astype(
        np.float32
    )[None]

    with torch.no_grad():
        t_out = tgen(torch.from_numpy(mel), torch.from_numpy(f0)).numpy()

    # convert the torch weights
    convert = _load_tool(
        "/root/repo/tools/nsf_hifigan/convert_checkpoint.py", "nsf_convert"
    ).convert

    sd = {k: v.numpy() for k, v in tgen.state_dict().items()}
    params = convert(sd, n_ups=4)

    from fish_diffusion_tpu.models.vocoders.nsf_hifigan import NsfHifiGANGenerator

    jgen = NsfHifiGANGenerator(
        num_mels=16,
        sampling_rate=44100,
        hop_size=64,
        upsample_rates=(4, 4, 2, 2),
        upsample_kernel_sizes=(8, 8, 4, 4),
        upsample_initial_channel=32,
        resblock="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    )

    # validate converted structure against a fresh init
    ref_params = jgen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.swapaxes(jnp.asarray(mel), 1, 2),
        jnp.asarray(f0),
    )["params"]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_params)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes, "converted param tree mismatch"

    with jax.default_matmul_precision("float32"):
        j_out = jgen.apply(
            {"params": params},
            jnp.swapaxes(jnp.asarray(mel), 1, 2),
            jnp.asarray(f0),
            rngs={"noise": jax.random.PRNGKey(2)},
        )
    j_out = np.asarray(j_out)[:, None, :]

    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=5e-4, rtol=1e-3)
