"""Spectral-norm parity for the first MSD discriminator.

The reference wraps every conv of the first MultiScaleDiscriminator scale
in ``torch.nn.utils.spectral_norm``
(``modules/vocoders/nsf_hifigan/models.py:594``). These tests pin the flax
implementation (``models/discriminators.py:spectral_norm_kernel`` +
``DiscriminatorS(use_spectral_norm=True)``) against torch bit-for-bit:
same weights and same starting u/v buffers must give the same normalized
outputs AND the same power-iteration trajectory across train-mode calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fish_diffusion_tpu.models.discriminators import (
    DiscriminatorS,
    MultiScaleDiscriminator,
    spectral_norm_kernel,
)


def _sync_u_v(flax_spectral, torch_convs, names):
    """Overwrite flax u/v buffers with the torch module's, name by name."""
    out = dict(flax_spectral)
    for name, conv in zip(names, torch_convs):
        out[f"{name}_u"] = jnp.asarray(conv.weight_u.detach().numpy().copy())
        out[f"{name}_v"] = jnp.asarray(conv.weight_v.detach().numpy().copy())
    return out


class TestKernelParity:
    def test_single_conv_multi_step_trajectory(self):
        """One Conv1d: outputs and u/v buffers track torch over 4 train
        forwards followed by one eval forward."""
        torch.manual_seed(0)
        conv = torch.nn.utils.spectral_norm(
            torch.nn.Conv1d(8, 16, 5, stride=2, padding=2)
        )
        x = torch.randn(2, 8, 64)

        kernel = jnp.asarray(conv.weight_orig.detach().numpy().copy().transpose(2, 1, 0))
        bias = jnp.asarray(conv.bias.detach().numpy().copy())
        u = jnp.asarray(conv.weight_u.detach().numpy().copy())
        v = jnp.asarray(conv.weight_v.detach().numpy().copy())

        xj = jnp.asarray(x.numpy().transpose(0, 2, 1))  # NWC

        for step in range(4):
            y_t = conv(x)
            w_bar, u, v = spectral_norm_kernel(kernel, u, v, update=True)
            y_j = (
                jax.lax.conv_general_dilated(
                    xj, w_bar, (2,), [(2, 2)],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                )
                + bias
            )
            np.testing.assert_allclose(
                np.asarray(y_j),
                y_t.detach().numpy().transpose(0, 2, 1),
                atol=2e-5,
                rtol=1e-5,
                err_msg=f"train step {step}",
            )
            np.testing.assert_allclose(
                np.asarray(u), conv.weight_u.detach().numpy(), atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(v), conv.weight_v.detach().numpy(), atol=1e-6
            )

        conv.eval()
        y_t = conv(x)
        w_bar, u2, v2 = spectral_norm_kernel(kernel, u, v, update=False)
        np.testing.assert_array_equal(np.asarray(u2), np.asarray(u))
        y_j = (
            jax.lax.conv_general_dilated(
                xj, w_bar, (2,), [(2, 2)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            + bias
        )
        np.testing.assert_allclose(
            np.asarray(y_j),
            y_t.detach().numpy().transpose(0, 2, 1),
            atol=2e-5,
            rtol=1e-5,
        )

    def test_grouped_conv(self):
        torch.manual_seed(1)
        conv = torch.nn.utils.spectral_norm(
            torch.nn.Conv1d(32, 64, 41, stride=2, groups=4, padding=20)
        )
        x = torch.randn(1, 32, 128)
        kernel = jnp.asarray(conv.weight_orig.detach().numpy().copy().transpose(2, 1, 0))
        bias = jnp.asarray(conv.bias.detach().numpy().copy())
        u = jnp.asarray(conv.weight_u.detach().numpy().copy())
        v = jnp.asarray(conv.weight_v.detach().numpy().copy())

        y_t = conv(x)
        w_bar, u, v = spectral_norm_kernel(kernel, u, v, update=True)
        y_j = (
            jax.lax.conv_general_dilated(
                jnp.asarray(x.numpy().transpose(0, 2, 1)),
                w_bar,
                (2,),
                [(20, 20)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=4,
            )
            + bias
        )
        np.testing.assert_allclose(
            np.asarray(y_j),
            y_t.detach().numpy().transpose(0, 2, 1),
            atol=2e-5,
            rtol=1e-5,
        )

    def test_sigma_gradient_flows_through_weight_only(self):
        """d/dW of (W/sigma) treats u, v as constants (torch detaches its
        buffers); the gradient must be finite and nonzero."""
        kernel = jnp.asarray(np.random.default_rng(2).standard_normal((3, 4, 8)),
                             jnp.float32)
        u = jnp.ones((8,)) / np.sqrt(8)
        v = jnp.ones((12,)) / np.sqrt(12)

        def loss(k):
            w_bar, _, _ = spectral_norm_kernel(k, u, v, update=True)
            return jnp.sum(w_bar**2)

        g = jax.grad(loss)(kernel)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


def _torch_disc_s():
    """Torch replica of the reference's spectral-norm DiscriminatorS
    (models.py:551-583 with use_spectral_norm=True)."""
    norm = torch.nn.utils.spectral_norm
    convs = torch.nn.ModuleList(
        [
            norm(torch.nn.Conv1d(1, 128, 15, 1, padding=7)),
            norm(torch.nn.Conv1d(128, 128, 41, 2, groups=4, padding=20)),
            norm(torch.nn.Conv1d(128, 256, 41, 2, groups=16, padding=20)),
            norm(torch.nn.Conv1d(256, 512, 41, 4, groups=16, padding=20)),
            norm(torch.nn.Conv1d(512, 1024, 41, 4, groups=16, padding=20)),
            norm(torch.nn.Conv1d(1024, 1024, 41, 1, groups=16, padding=20)),
            norm(torch.nn.Conv1d(1024, 1024, 5, 1, padding=2)),
        ]
    )
    conv_post = norm(torch.nn.Conv1d(1024, 1, 3, 1, padding=1))
    return convs, conv_post


def _torch_forward(convs, conv_post, x):
    fmap = []
    h = x
    for c in convs:
        h = torch.nn.functional.leaky_relu(c(h), 0.1)
        fmap.append(h)
    h = conv_post(h)
    fmap.append(h)
    return h.flatten(1), fmap


@pytest.mark.parametrize("blocked", [False, True])
def test_msd_first_discriminator_parity(blocked):
    """Full DiscriminatorS stack vs torch over two train-mode forwards."""
    torch.manual_seed(3)
    convs, conv_post = _torch_disc_s()
    x = torch.randn(1, 1, 2048)

    disc = DiscriminatorS(use_spectral_norm=True, blocked=blocked)
    variables = disc.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()[:, 0]))

    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    params = dict(params)
    names = [f"convs_{i}" for i in range(7)] + ["conv_post"]
    for name, conv in zip(names, list(convs) + [conv_post]):
        params[f"{name}_conv"] = {
            "kernel": jnp.asarray(
                conv.weight_orig.detach().numpy().copy().transpose(2, 1, 0)
            ),
            "bias": jnp.asarray(conv.bias.detach().numpy().copy()),
        }
    spectral = _sync_u_v(
        variables["spectral"], list(convs) + [conv_post], names
    )

    xj = jnp.asarray(x.numpy()[:, 0])
    for step in range(2):
        score_t, fmap_t = _torch_forward(convs, conv_post, x)
        (score_j, fmap_j), mut = disc.apply(
            {"params": params, "spectral": spectral},
            xj,
            True,
            mutable=["spectral"],
        )
        spectral = mut["spectral"]
        for k, (ft, fj) in enumerate(zip(fmap_t, fmap_j)):
            np.testing.assert_allclose(
                np.asarray(fj),
                ft.detach().numpy().transpose(0, 2, 1),
                atol=5e-4,
                rtol=1e-4,
                err_msg=f"step {step} fmap {k} (blocked={blocked})",
            )
        np.testing.assert_allclose(
            np.asarray(score_j),
            score_t.detach().numpy(),
            atol=5e-4,
            rtol=1e-4,
        )
        # u buffers advanced identically
        for name, conv in zip(names, list(convs) + [conv_post]):
            np.testing.assert_allclose(
                np.asarray(spectral[f"{name}_u"]),
                conv.weight_u.detach().numpy(),
                atol=1e-5,
                err_msg=f"u buffer {name} step {step}",
            )


def test_msd_uses_spectral_norm_on_first_scale_only():
    msd = MultiScaleDiscriminator()
    wav = jnp.zeros((1, 4096))
    variables = msd.init(jax.random.PRNGKey(0), wav)
    assert set(variables["spectral"].keys()) == {"disc_s0"}
    # the spectral-norm scale has no WeightNorm scale params
    paths = [
        jax.tree_util.keystr(path)
        for path, _ in jax.tree_util.tree_flatten_with_path(
            variables["params"]["disc_s0"]
        )[0]
    ]
    assert not any("scale" in p for p in paths), paths
    # immutable apply (G phase) leaves the state untouched and works
    scores, fmaps = msd.apply(variables, wav, False)
    assert len(scores) == 3 and len(fmaps) == 3


def test_v1_gan_step_threads_spectral_state():
    """The jitted v1 two-player step advances the power-iteration buffers."""
    import optax

    from fish_diffusion_tpu.training.gan import (
        Discriminators,
        create_gan_state,
        make_gan_train_step,
    )

    t = 4096
    proj = jnp.asarray(
        np.random.default_rng(0).standard_normal((16, t)).astype(np.float32)
        / 64.0
    )

    def generator_init():
        return {"w": jnp.zeros((16,))}

    def generator_apply(params, batch, rng):
        return jnp.tanh(params["w"] @ proj)[None, :].repeat(
            batch["audio"].shape[0], 0
        )

    discs = Discriminators("v1")
    tx = optax.adam(1e-4)
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, t)).astype(np.float32)
    )
    state = create_gan_state(
        generator_init, discs, wav[:1], jax.random.PRNGKey(0), tx, tx
    )
    assert state.spectral_d and "second" in state.spectral_d

    step = make_gan_train_step(generator_apply, discs, tx, tx)
    u0 = np.asarray(state.spectral_d["second"]["disc_s0"]["convs_0_u"])
    state2, metrics = step(state, {"audio": wav}, jax.random.PRNGKey(1))
    u1 = np.asarray(state2.spectral_d["second"]["disc_s0"]["convs_0_u"])
    assert not np.allclose(u0, u1), "power iteration did not advance"
    assert np.isfinite(float(metrics["loss_d"]))
    assert np.isfinite(float(metrics["loss_g"]))
