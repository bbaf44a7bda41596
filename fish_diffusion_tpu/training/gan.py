"""The GAN training regime: two-player adversarial step as ONE jitted
function.

Replaces the reference's Lightning manual-optimization loops
(``archs/hifisinger/hifisinger_v1.py:96-209``, ``hifisinger_v2.py:144-276``,
``tools/nsf_hifigan/train.py:32-328``): instead of two manual_backward
passes per batch, a single jitted SPMD function computes the discriminator
update (on ``stop_gradient``-detached fakes) and then the generator update
against the *updated* discriminators — matching the reference's D-then-G
ordering — with all losses fused into one XLA program.

Loss menus:
- ``v2`` (HiFiSingerV2 / RefineGAN): 45 * multi-scale-mel(smooth-l1) +
  envelope + MPD adv + MRD adv (averaged LSGAN) (hifisinger_v2.py:204-269)
- ``v1`` (HiFiSingerV1 / NSF-HiFiGAN trainer): MPD + MSD, feature matching,
  45 * multi-scale mel L1 + multi-scale linear STFT L1 + envelope
  (summed LSGAN) (hifisinger_v1.py:96-209, tools/nsf_hifigan/train.py)
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    envelope_loss,
    feature_loss,
    generator_adv_loss,
    multi_scale_mel_loss,
    multi_scale_stft_loss,
)


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    params_g: Any
    params_d: Any
    opt_state_g: Any
    opt_state_d: Any
    # power-iteration u/v buffers of the spectral-norm MSD discriminator
    # (v1 flavor; empty dict for v2) — explicit state so the pure jitted
    # two-player step can update them (reference models.py:594 keeps them
    # as torch buffers mutated in the forward pre-hook)
    spectral_d: Any = struct.field(default_factory=dict)


class Discriminators:
    """Bundle of the discriminator modules for a GAN flavor."""

    def __init__(
        self,
        flavor: str = "v2",
        mpd_cfg: Optional[dict] = None,
        mrd_cfg: Optional[dict] = None,
        dtype: Any = None,
    ):
        """``dtype``: discriminator COMPUTE dtype (params stay f32).
        Default f32 — the reference pins GAN runs at "32-true"
        (svc_hifisinger_v2.py:112). bf16 halves the discriminators' HBM
        traffic, which the r5 attribution shows is ~90% of the v1 trainer
        step's bytes (docs/artifacts/vocoder_step_attribution_r05.json);
        bf16 keeps f32's exponent range so the reference's overflow
        concerns (fp16 AMP era) don't apply. Spectral/weight-norm kernel
        math and all loss reductions stay f32 regardless."""
        assert flavor in ("v1", "v2")
        self.flavor = flavor
        kw = {"dtype": dtype} if dtype is not None else {}
        self.mpd = MultiPeriodDiscriminator(**{**(mpd_cfg or {}), **kw})
        if flavor == "v2":
            self.second = MultiResolutionDiscriminator(
                **{**(mrd_cfg or {}), **kw}
            )
        else:
            self.second = MultiScaleDiscriminator(**kw)

    def init(self, rng, wav):
        # jit the init: eager flax init executes op-by-op, which is
        # pathologically slow over a remote-device tunnel
        def _init(rng, wav):
            p_mpd = self.mpd.init(rng, wav)["params"]
            v_2 = self.second.init(jax.random.fold_in(rng, 1), wav)
            return (
                {"mpd": p_mpd, "second": v_2["params"]},
                {"second": v_2["spectral"]} if "spectral" in v_2 else {},
            )

        return jax.jit(_init)(rng, wav)

    def apply(self, params, wav, spectral=None, update: bool = False):
        """Run both discriminator stacks.

        Returns ``((scores1, fmaps1), (scores2, fmaps2), spectral)`` where
        ``spectral`` is the (possibly power-iterated) u/v state — pass it
        back on the next call. ``update=True`` runs one power iteration in
        the spectral-norm discriminator (torch train-mode semantics).
        """
        s1, f1 = self.mpd.apply({"params": params["mpd"]}, wav)
        vars2 = {"params": params["second"]}
        if spectral and spectral.get("second"):
            vars2["spectral"] = spectral["second"]
            if update:
                (s2, f2), mut = self.second.apply(
                    vars2, wav, True, mutable=["spectral"]
                )
                return (s1, f1), (s2, f2), {"second": mut["spectral"]}
            s2, f2 = self.second.apply(vars2, wav, False)
        else:
            s2, f2 = self.second.apply(vars2, wav)
        return (s1, f1), (s2, f2), spectral


def create_gan_state(
    generator_init: Callable[[], Any],
    discriminators: Discriminators,
    example_wav: jax.Array,
    rng: jax.Array,
    optimizer_g: optax.GradientTransformation,
    optimizer_d: optax.GradientTransformation,
) -> GANTrainState:
    params_g = jax.jit(generator_init)()
    params_d, spectral_d = discriminators.init(
        jax.random.fold_in(rng, 7), example_wav
    )
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        opt_state_g=optimizer_g.init(params_g),
        opt_state_d=optimizer_d.init(params_d),
        spectral_d=spectral_d,
    )


def make_gan_train_step(
    generator_apply: Callable,
    discriminators: Discriminators,
    optimizer_g: optax.GradientTransformation,
    optimizer_d: optax.GradientTransformation,
    sampling_rate: int = 44100,
    multi_scale_mels: Sequence = ((2048, 256, 2048), (2048, 270, 1080), (4096, 540, 2160)),
    mel_loss_weight: float = 45.0,
    use_feature_matching: Optional[bool] = None,
    use_stft_loss: Optional[bool] = None,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Build the jitted two-player step.

    ``generator_apply(params_g, batch, rng) -> wav [B, T]``.
    Returns ``step(state, batch, rng) -> (state, metrics)``; ``batch`` must
    contain ``audio`` [B, T] ground truth.
    """
    flavor = discriminators.flavor
    if use_feature_matching is None:
        use_feature_matching = flavor == "v1"
    if use_stft_loss is None:
        use_stft_loss = flavor == "v1"
    average = flavor == "v2"

    def d_loss_fn(params_d, spectral_d, y, y_hat):
        # one power iteration per discriminator forward (torch train-mode
        # semantics: real pass then fake pass each advance u/v)
        (s1_r, _), (s2_r, _), spectral_d = discriminators.apply(
            params_d, y, spectral_d, update=True
        )
        (s1_g, _), (s2_g, _), spectral_d = discriminators.apply(
            params_d, y_hat, spectral_d, update=True
        )
        loss_1 = discriminator_loss(s1_r, s1_g, average=average)
        loss_2 = discriminator_loss(s2_r, s2_g, average=average)
        # diagnostics: mean D outputs (LSGAN optimum: real->1, fake->0;
        # both drifting toward 0.5 = D losing, both saturating = G losing)
        score_stats = {
            "d_score_real": sum(jnp.mean(s) for s in s1_r + s2_r)
            / (len(s1_r) + len(s2_r)),
            "d_score_fake": sum(jnp.mean(s) for s in s1_g + s2_g)
            / (len(s1_g) + len(s2_g)),
        }
        return loss_1 + loss_2, (spectral_d, score_stats)

    def g_loss_fn(params_g, params_d, spectral_d, batch, rng):
        y = batch["audio"]
        y_hat = generator_apply(params_g, batch, rng)
        y = y[:, : y_hat.shape[1]]

        (s1_r, f1_r), (s2_r, f2_r), _ = discriminators.apply(
            params_d, y, spectral_d
        )
        (s1_g, f1_g), (s2_g, f2_g), _ = discriminators.apply(
            params_d, y_hat, spectral_d
        )

        loss_adv = generator_adv_loss(s1_g, average=average) + generator_adv_loss(
            s2_g, average=average
        )
        loss_mel = multi_scale_mel_loss(
            y, y_hat, sampling_rate, multi_scale_mels,
            loss="smoothed-l1" if flavor == "v2" else "l1",
        )
        loss_env = envelope_loss(y, y_hat)

        loss = mel_loss_weight * loss_mel + loss_env + loss_adv
        aux = {
            "loss_mel": loss_mel,
            "loss_env": loss_env,
            "loss_adv": loss_adv,
        }

        if use_feature_matching:
            loss_fm = feature_loss(f1_r, f1_g) + feature_loss(f2_r, f2_g)
            loss = loss + loss_fm
            aux["loss_fm"] = loss_fm

        if use_stft_loss:
            loss_stft = multi_scale_stft_loss(y, y_hat)
            loss = loss + loss_stft
            aux["loss_stft"] = loss_stft

        return loss, (aux, y_hat)

    def step_fn(state: GANTrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        rng_g1, rng_g2 = jax.random.split(rng)

        # --- discriminator phase (fakes detached) ---
        y = batch["audio"]
        y_hat = jax.lax.stop_gradient(
            generator_apply(state.params_g, batch, rng_g1)
        )
        y_cut = y[:, : y_hat.shape[1]]

        (d_loss, (spectral_d, score_stats)), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.params_d, state.spectral_d, y_cut, y_hat)
        updates_d, opt_state_d = optimizer_d.update(
            grads_d, state.opt_state_d, state.params_d
        )
        params_d = optax.apply_updates(state.params_d, updates_d)

        # --- generator phase (against updated discriminators) ---
        (g_loss, (aux, _)), grads_g = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params_g, params_d, spectral_d, batch, rng_g1)
        updates_g, opt_state_g = optimizer_g.update(
            grads_g, state.opt_state_g, state.params_g
        )
        params_g = optax.apply_updates(state.params_g, updates_g)

        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            opt_state_g=opt_state_g,
            opt_state_d=opt_state_d,
            spectral_d=spectral_d,
        )
        metrics = {"loss_d": d_loss, "loss_g": g_loss, **aux, **score_stats}
        return new_state, metrics

    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        batch_shard = NamedSharding(mesh, P("data"))
        return jax.jit(
            step_fn,
            in_shardings=(replicated, batch_shard, replicated),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))
