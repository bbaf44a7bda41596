"""True numerical parity: reference torch ConvNext denoiser -> checkpoint
converter -> scanned flax ConvNext, same inputs -> same epsilon prediction.

(The reference module imports fish_diffusion.modules.wavenet for
DiffusionEmbedding, so it loads under a synthetic package shim — no
reference code is imported into the framework itself.)
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

REF_DIR = Path("/root/reference/fish_diffusion/modules")


def load_reference_convnext():
    if "fish_diffusion" not in sys.modules:
        for name, path in [
            ("fish_diffusion", None),
            ("fish_diffusion.modules", None),
        ]:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            sys.modules[name] = pkg
        spec = importlib.util.spec_from_file_location(
            "fish_diffusion.modules.wavenet", REF_DIR / "wavenet.py"
        )
        wn = importlib.util.module_from_spec(spec)
        sys.modules["fish_diffusion.modules.wavenet"] = wn
        spec.loader.exec_module(wn)

    spec = importlib.util.spec_from_file_location(
        "fish_diffusion.modules.convnext", REF_DIR / "convnext.py"
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules["fish_diffusion.modules.convnext"] = m
    spec.loader.exec_module(m)
    return m


@pytest.mark.skipif(not REF_DIR.exists(), reason="reference repo not mounted")
def test_converted_convnext_matches_torch():
    ref = load_reference_convnext()

    MEL, DIM, COND, LAYERS, CYCLE = 16, 24, 12, 4, 2
    torch.manual_seed(0)
    tnet = ref.ConvNext(
        mel_channels=MEL,
        dim=DIM,
        mlp_factor=2,
        condition_dim=COND,
        num_layers=LAYERS,
        dilation_cycle=CYCLE,
    )
    tnet.eval()
    # layer-scale gamma is constant at init; randomize for a stronger test
    with torch.no_grad():
        for layer in tnet.residual_layers:
            layer.gamma.copy_(torch.rand_like(layer.gamma))

    rng = np.random.default_rng(1)
    B, T = 2, 32
    x = rng.standard_normal((B, MEL, T)).astype(np.float32)
    cond = rng.standard_normal((B, COND, T)).astype(np.float32)
    t = np.array([7, 300], np.int64)

    with torch.no_grad():
        t_out = tnet(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond)
        ).numpy()

    sys.path.insert(0, "/root/repo/tools/diffusion")
    from convert_torch_checkpoint import convert_convnext

    sd = {f"d.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    params = convert_convnext(sd, "d")

    from fish_diffusion_tpu.models.convnext import ConvNext

    jnet = ConvNext(
        mel_channels=MEL,
        dim=DIM,
        mlp_factor=2,
        condition_dim=COND,
        num_layers=LAYERS,
        dilation_cycle=CYCLE,
    )
    j_out = jnet.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(t),
        jnp.asarray(cond.transpose(0, 2, 1)),
    )
    j_out = np.asarray(j_out).transpose(0, 2, 1)

    np.testing.assert_allclose(j_out, t_out, atol=2e-5, rtol=1e-4)
