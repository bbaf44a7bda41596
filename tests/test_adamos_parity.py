"""True numerical parity: reference torch ADaMoS (ConvNeXt backbone + SiLU
HiFiGAN head) -> converter -> flax ADaMoSGenerator."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

REF_DIR = Path("/root/reference/fish_diffusion/modules/vocoders/adamos")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_adamos_{name}", REF_DIR / f"{name}.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _load_tool(path, name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not REF_DIR.exists(), reason="reference repo not mounted")
def test_converted_adamos_matches_torch():
    enc_mod = _load("encoder")
    head_mod = _load("hifigan")

    MEL = 8
    DIMS = [8, 12, 16, 16]
    HOP = 32

    torch.manual_seed(0)
    backbone = enc_mod.ConvNeXtEncoder(
        input_channels=MEL, depths=[1, 1, 2, 1], dims=DIMS,
        drop_path_rate=0, kernel_sizes=(7,),
    )
    head = head_mod.HiFiGANGenerator(
        hop_length=HOP,
        upsample_rates=(4, 4, 2),
        upsample_kernel_sizes=(8, 8, 4),
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        num_mels=DIMS[-1],
        upsample_initial_channel=16,
        use_template=False,
        pre_conv_kernel_size=13,
        post_conv_kernel_size=13,
    )
    backbone.eval()
    head.eval()

    rng = np.random.default_rng(7)
    B, T = 1, 12
    mel = rng.uniform(-4, 0, (B, MEL, T)).astype(np.float32)

    with torch.no_grad():
        t_out = head(backbone(torch.from_numpy(mel))).numpy()

    convert_adamos = _load_tool(
        "/root/repo/tools/adamos/convert_checkpoint.py", "adamos_convert"
    ).convert_adamos

    sd = {}
    sd.update({f"backbone.{k}": v.numpy() for k, v in backbone.state_dict().items()})
    sd.update({f"head.{k}": v.numpy() for k, v in head.state_dict().items()})
    params = convert_adamos(sd)

    from fish_diffusion_tpu.models.vocoders.adamos import (
        ConvNeXtEncoder,
        HiFiGANHead,
    )
    from flax import linen as nn

    class Gen(nn.Module):
        @nn.compact
        def __call__(self, mel):
            h = ConvNeXtEncoder(
                input_channels=MEL, depths=(1, 1, 2, 1), dims=tuple(DIMS),
                name="backbone",
            )(mel)
            return HiFiGANHead(
                hop_length=HOP,
                upsample_rates=(4, 4, 2),
                upsample_kernel_sizes=(8, 8, 4),
                resblock_kernel_sizes=(3, 7),
                resblock_dilation_sizes=((1, 3, 5),) * 2,
                num_mels=DIMS[-1],
                upsample_initial_channel=16,
                pre_conv_kernel_size=13,
                post_conv_kernel_size=13,
                name="head",
            )(h)

    j_out = np.asarray(
        Gen().apply({"params": params}, jnp.asarray(mel.transpose(0, 2, 1)))
    )

    np.testing.assert_allclose(j_out, t_out[:, 0], atol=5e-5, rtol=1e-3)


def test_blocked_tail_matches_plain():
    """Space-to-depth head compute (blocked_tail) == plain path."""
    import jax
    import jax.tree_util as jtu

    from fish_diffusion_tpu.models.vocoders.adamos import HiFiGANHead

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 512)), jnp.float32)
    gp = HiFiGANHead(blocked_tail=False)
    gb = HiFiGANHead(blocked_tail=True)
    v = jax.jit(gp.init)(jax.random.PRNGKey(0), x)
    vb = jax.eval_shape(lambda: gb.init(jax.random.PRNGKey(0), x))
    assert jtu.tree_structure(v) == jtu.tree_structure(vb)
    assert all(
        a.shape == b.shape
        for a, b in zip(jtu.tree_leaves(v), jtu.tree_leaves(vb))
    )
    y0 = gp.apply(v, x)
    y1 = gb.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), atol=2e-5, rtol=1e-4
    )
