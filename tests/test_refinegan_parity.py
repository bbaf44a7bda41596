"""True numerical parity: reference torch RefineGANGenerator -> converter ->
flax, same mel+f0 -> same waveform.

Randomness is neutralized structurally (both sides keep their RNG plumbing):
AdaIN weights set to 0 (noise amplitude is learned; 0 disables it) and the
comb template's noise_std set to 0 with all-voiced f0 (noise amp = uv * 0).
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = Path("/root/reference/fish_diffusion/modules/vocoders/refinegan/generator.py")


def load_reference():
    spec = importlib.util.spec_from_file_location("ref_refinegan", REF)
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
def test_converted_refinegan_matches_torch():
    ref = load_reference()

    torch.manual_seed(0)
    tnet = ref.RefineGANGenerator(
        sampling_rate=44100,
        hop_length=256,
        num_mels=8,
        start_channels=4,
        template_generator="comb",
    )
    tnet.eval()
    with torch.no_grad():
        tnet.template_gen.noise_std = 0.0
        for m in tnet.modules():
            if isinstance(m, ref.AdaIN):
                m.weight.zero_()

    rng = np.random.default_rng(5)
    B, T = 1, 8
    mel = rng.uniform(-4, 0, (B, 8, T)).astype(np.float32)
    f0 = np.full((B, 1, T), 220.0, np.float32)

    with torch.no_grad():
        t_out = tnet(torch.from_numpy(mel), torch.from_numpy(f0)).numpy()

    convert_refinegan = _load_tool(
        "/root/repo/tools/refinegan/convert_checkpoint.py", "refinegan_convert"
    ).convert_refinegan

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params = convert_refinegan(sd)

    from fish_diffusion_tpu.models.vocoders.refinegan import RefineGANGenerator

    jnet = RefineGANGenerator(
        sampling_rate=44100,
        hop_length=256,
        num_mels=8,
        start_channels=4,
        template_generator="comb",
        template_noise_std=0.0,
    )
    j_out = jnet.apply(
        {"params": params},
        jnp.asarray(mel.transpose(0, 2, 1)),
        jnp.asarray(f0[:, 0]),
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    j_out = np.asarray(j_out)  # [B, T*hop]

    np.testing.assert_allclose(j_out, t_out[:, 0], atol=5e-5, rtol=1e-3)


def test_blocked_tail_matches_plain():
    """Space-to-depth compute (blocked_tail) == plain path: same param
    tree, same outputs (AdaIN noise draws are row-major-reshape-identical
    across layouts)."""
    import jax.tree_util as jtu

    from fish_diffusion_tpu.models.vocoders.refinegan import RefineGANGenerator

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.uniform(-4, 0, (2, 32, 128)), jnp.float32)
    f0 = jnp.asarray(rng.uniform(80, 600, (2, 32)), jnp.float32)

    gp = RefineGANGenerator(blocked_tail=False)
    gb = RefineGANGenerator(blocked_tail=True)
    keys = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    v = jax.jit(gp.init)(keys, mel, f0)
    vb = jax.eval_shape(lambda: gb.init(keys, mel, f0))
    assert jtu.tree_structure(v) == jtu.tree_structure(vb)
    assert all(
        a.shape == b.shape
        for a, b in zip(jtu.tree_leaves(v), jtu.tree_leaves(vb))
    )

    y0 = gp.apply(v, mel, f0, rngs={"noise": jax.random.PRNGKey(2)})
    y1 = gb.apply(v, mel, f0, rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), atol=3e-5, rtol=1e-4
    )
