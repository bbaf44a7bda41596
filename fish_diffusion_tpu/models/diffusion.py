"""Gaussian diffusion over normalized mel spectrograms, TPU-native.

Capability parity with the reference
``fish_diffusion/archs/diffsinger/diffusions/diffusion.py:49-319`` (training
q_sample/p_losses, spec normalization, shallow diffusion) and its three
samplers (``noise_predictor.py:19-222``, ``uni_pc.py``):

- **naive**  — full DDPM ancestral sampling
- **plms**   — pseudo linear multistep (Adams–Bashforth stages 0-3)
- **unipc**  — UniPC multistep data-prediction solver, variants bh1/bh2,
  orders 1-3 (the modes the reference framework invokes; others fail loudly)

TPU-first design: every sampler is ONE ``lax.scan`` whose per-step scalar
coefficients (posterior means/variances, PLMS alphas, the entire UniPC
lambda/rho/B_h algebra) are precomputed host-side in float64 numpy and fed as
scan inputs. The scan body is just: denoiser eval + a handful of fused
elementwise ops. The whole reverse process compiles to a single XLA program —
the reference pays a Python-loop dispatch per step
(``diffusion.py:246-253``).

Layout: mel/features are channels-last ``[B, T, C]``.
"""

from __future__ import annotations

import json
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.schedule import get_noise_schedule_list
from ..registry import DENOISERS, DIFFUSIONS

Dtype = Any


# ---------------------------------------------------------------------------
# Host-side coefficient tables
# ---------------------------------------------------------------------------


class ScheduleCoefficients:
    """All schedule-derived constants, numpy float64 for accuracy."""

    def __init__(self, betas: np.ndarray):
        self.betas = betas
        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])

        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod - 1)

        # posterior q(x_{t-1} | x_t, x_0)  (reference noise_predictor.py:50-71)
        self.posterior_variance = (
            betas * (1.0 - self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        self.posterior_log_variance_clipped = np.log(
            np.maximum(self.posterior_variance, 1e-20)
        )
        self.posterior_mean_coef1 = (
            betas * np.sqrt(self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        self.posterior_mean_coef2 = (
            (1.0 - self.alphas_cumprod_prev)
            * np.sqrt(alphas)
            / (1.0 - self.alphas_cumprod)
        )

        # continuous-time VP wrapping for UniPC (uni_pc.py:85-103):
        # log alpha_t at grid t_i=(i+1)/N, piecewise-linear interpolated
        self.log_alphas = 0.5 * np.cumsum(np.log(1 - betas))
        self.t_array = np.linspace(0.0, 1.0, len(betas) + 1)[1:]


def _marginal_log_alpha(coeffs: ScheduleCoefficients, t: np.ndarray) -> np.ndarray:
    return np.interp(t, coeffs.t_array, coeffs.log_alphas)


def _marginal_lambda(coeffs: ScheduleCoefficients, t: np.ndarray) -> np.ndarray:
    log_alpha = _marginal_log_alpha(coeffs, t)
    log_sigma = 0.5 * np.log(1.0 - np.exp(2.0 * log_alpha))
    return log_alpha - log_sigma


def unipc_step_table(
    coeffs: ScheduleCoefficients,
    steps: int,
    t_start: Optional[float] = None,
    variant: str = "bh2",
    order: int = 2,
) -> dict:
    """Precompute everything the UniPC multistep scan needs (orders 1-3).

    Returns arrays of length ``steps`` (for update steps 1..steps), matching
    the reference's ``multistep_uni_pc_bh_update`` algebra
    (``uni_pc.py:583-680``) specialized to: variant bh1/bh2, order<=3,
    data-prediction (model_type="noise" wrapped with predict_x0 — the only
    mode the reference framework invokes, noise_predictor.py:195-217),
    time_uniform grid, lower_order_final, corrector on all but the last
    step. Any other UniPC mode (vary_coeff, singlestep, order>3) fails
    loudly in ``GaussianDiffusion.setup``.

    ``D1s`` has up to ``order - 1`` columns; the tables carry 2 slots with
    zeros where the effective order (min(step, order, steps+1-step)) is
    lower.
    """
    if variant not in ("bh1", "bh2"):
        raise ValueError(
            f"unsupported UniPC variant {variant!r}: this framework "
            "implements the bh1/bh2 multistep data-prediction solver the "
            "reference invokes; vary_coeff/singlestep are not supported"
        )
    if not 1 <= order <= 3:
        raise ValueError(
            f"unsupported UniPC order {order}: supported orders are 1-3"
        )

    N = len(coeffs.betas)
    t_T = 1.0 if t_start is None else t_start
    t_0 = 1.0 / N
    timesteps = np.linspace(t_T, t_0, steps + 1)

    lambdas = _marginal_lambda(coeffs, timesteps)
    log_alphas = _marginal_log_alpha(coeffs, timesteps)
    alphas = np.exp(log_alphas)
    sigmas = np.sqrt(1.0 - np.exp(2.0 * log_alphas))
    # model input times (uni_pc.py:214-225): (t - 1/N) * N
    model_times = (timesteps - 1.0 / N) * N

    out = {
        "model_times": model_times.astype(np.float32),
        "c_x": np.zeros(steps, np.float32),          # sigma_t / sigma_prev0
        "c_m0": np.zeros(steps, np.float32),         # -alpha_t * h_phi_1
        "c_pred": np.zeros((steps, 2), np.float32),  # -alpha_t*B_h*rhos_p[k]
        "c_corr": np.zeros((steps, 2), np.float32),  # -alpha_t*B_h*rhos_c[k]
        "c_corr_D1t": np.zeros(steps, np.float32),   # -alpha_t*B_h*rhos_c[-1]
        "inv_rk": np.zeros((steps, 2), np.float32),  # 1/rk_k for D1s columns
        "alpha_in": alphas.astype(np.float32),       # x0-from-noise per grid pt
        "sigma_in": sigmas.astype(np.float32),
    }

    for step in range(1, steps + 1):
        i = step - 1
        lam_prev0, lam_t = lambdas[step - 1], lambdas[step]
        sigma_prev0, sigma_t = sigmas[step - 1], sigmas[step]
        alpha_t = alphas[step]

        h = lam_t - lam_prev0
        hh = -h  # predict_x0
        h_phi_1 = np.expm1(hh)
        B_h = np.expm1(hh) if variant == "bh2" else hh  # bh2 | bh1

        # init phase order=min(step, order); final steps limited by
        # lower_order_final: min(order, steps+1-step)
        o = min(step, order, steps + 1 - step)

        out["c_x"][i] = sigma_t / sigma_prev0
        out["c_m0"][i] = -alpha_t * h_phi_1

        # rks for the D1s columns (uni_pc.py:598-607), rks[-1]=1 for D1_t
        rks = []
        for k in range(1, o):
            lam_prev_k = lambdas[step - 1 - k]
            rks.append((lam_prev_k - lam_prev0) / h)
            out["inv_rk"][i, k - 1] = 1.0 / rks[-1]
        rks_full = np.array(rks + [1.0])

        # R / b (uni_pc.py:612-630)
        R_rows, b_vals = [], []
        h_phi_k = h_phi_1 / hh - 1.0
        factorial_i = 1.0
        for j in range(1, o + 1):
            R_rows.append(rks_full ** (j - 1))
            b_vals.append(h_phi_k * factorial_i / B_h)
            factorial_i *= j + 1
            h_phi_k = h_phi_k / hh - 1.0 / factorial_i
        R = np.stack(R_rows)
        b = np.array(b_vals)

        # predictor rhos (uni_pc.py:645-650): order 2 -> [0.5]; order 3 ->
        # solve the leading (o-1)x(o-1) system
        if o == 2:
            out["c_pred"][i, 0] = -alpha_t * B_h * 0.5
        elif o == 3:
            rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
            out["c_pred"][i, :2] = -alpha_t * B_h * rhos_p

        # corrector rhos (uni_pc.py:652-656): order 1 -> [0.5]
        if o == 1:
            out["c_corr_D1t"][i] = -alpha_t * B_h * 0.5
        else:
            rhos_c = np.linalg.solve(R, b)
            out["c_corr"][i, : o - 1] = -alpha_t * B_h * rhos_c[:-1]
            out["c_corr_D1t"][i] = -alpha_t * B_h * rhos_c[-1]

    return out


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def _smooth_l1(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def mel_loss(
    loss_fn: Union[str, Sequence], noise: jax.Array, epsilon: jax.Array
) -> jax.Array:
    """Noise-prediction loss (reference diffusion.py:153-170)."""
    if isinstance(loss_fn, (list, tuple)):
        return sum(
            weight * mel_loss(fn, noise, epsilon) for weight, fn in loss_fn
        )
    if loss_fn == "l1":
        return jnp.mean(jnp.abs(noise - epsilon))
    if loss_fn == "smoothed-l1":
        return jnp.mean(_smooth_l1(epsilon, noise))
    if loss_fn == "l2":
        return jnp.mean((noise - epsilon) ** 2)
    if callable(loss_fn):
        return loss_fn(noise, epsilon)
    raise NotImplementedError(loss_fn)


# ---------------------------------------------------------------------------
# The diffusion module
# ---------------------------------------------------------------------------


@DIFFUSIONS.register_module()
class GaussianDiffusion(nn.Module):
    """DDPM over normalized mel in [-1, 1].

    Config surface mirrors the reference
    (``configs/_base_/archs/diff_svc_v2.py:18-37``).

    RNG streams: ``diffusion`` for timestep/noise draws. Methods:

    - ``train_step(features, mel, ...)`` — loss dict (one denoiser eval)
    - ``__call__(features, ...)``        — full reverse sampling to mel
    """

    denoiser: dict
    mel_channels: int = 128
    noise_schedule: str = "linear"
    timesteps: int = 1000
    max_beta: float = 0.01
    s: float = 0.008
    noise_loss: Union[str, tuple] = "l1"
    sampler_interval: int = 10
    spec_stats_path: str = "dataset/stats.json"
    spec_min: Optional[Sequence[float]] = None
    spec_max: Optional[Sequence[float]] = None
    noise_predictor: Optional[str] = None
    unipc_variant: str = "bh2"
    unipc_order: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        # fail loudly on unsupported UniPC modes (the reference's vendored
        # library also has vary_coeff/singlestep/CFG, which the framework
        # never invokes — see unipc_step_table docstring)
        if self.unipc_variant not in ("bh1", "bh2"):
            raise ValueError(
                f"unsupported unipc_variant {self.unipc_variant!r} "
                "(supported: 'bh1', 'bh2'; vary_coeff/singlestep are not)"
            )
        if not 1 <= self.unipc_order <= 3:
            raise ValueError(
                f"unsupported unipc_order {self.unipc_order} (supported: 1-3)"
            )
        self.denoise_fn = DENOISERS.build(dict(self.denoiser))

        betas = get_noise_schedule_list(
            self.noise_schedule, self.timesteps, self.max_beta, self.s
        ).astype(np.float64)
        self.coeffs = ScheduleCoefficients(betas)

        spec_min, spec_max = self.spec_min, self.spec_max
        if spec_min is None:
            with open(self.spec_stats_path) as f:
                stats = json.load(f)
            spec_min, spec_max = stats["spec_min"], stats["spec_max"]

        assert len(spec_min) == len(spec_max) and len(spec_min) in (
            1,
            self.mel_channels,
        ), "spec_min/spec_max must have length 1 or mel_channels"

        self._spec_min = np.asarray(spec_min, np.float32).reshape(1, 1, -1)
        self._spec_max = np.asarray(spec_max, np.float32).reshape(1, 1, -1)

        predictor = self.noise_predictor
        if predictor is None:
            predictor = "naive" if self.sampler_interval == 1 else "unipc"
        self._predictor = predictor

    # -- spec normalization (reference diffusion.py:315-319) ---------------

    def norm_spec(self, x):
        return (x - self._spec_min) / (self._spec_max - self._spec_min) * 2 - 1

    def denorm_spec(self, x):
        return (x + 1) / 2 * (self._spec_max - self._spec_min) + self._spec_min

    # -- forward process ----------------------------------------------------

    def q_sample(self, x_start, t, noise):
        """Noising to step t (reference diffusion.py:120-127). t: [B] int."""
        sqrt_acp = jnp.asarray(self.coeffs.sqrt_alphas_cumprod, jnp.float32)
        sqrt_1macp = jnp.asarray(
            self.coeffs.sqrt_one_minus_alphas_cumprod, jnp.float32
        )
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        return (
            sqrt_acp[t].reshape(shape) * x_start
            + sqrt_1macp[t].reshape(shape) * noise
        )

    # -- training -----------------------------------------------------------

    def train_step(self, features, mel, x_masks=None, cond_masks=None):
        """One diffusion training step (reference diffusion.py:172-190).

        features: [B, T, C] condition; mel: [B, T, M].

        Note on masking: the reference leaves the *target* noise unmasked
        while hard-masking the prediction (diffusion.py:136-145), adding a
        constant |noise| floor at padded positions. We mask both — gradients
        are identical (the prediction is zero at padding either way), the
        loss value just loses the spurious floor.
        """
        b = features.shape[0]
        rng_t, rng_noise = jax.random.split(self.make_rng("diffusion"))

        t = jax.random.randint(rng_t, (b,), 0, self.timesteps)
        x = self.norm_spec(mel)
        noise = jax.random.normal(rng_noise, x.shape, jnp.float32)

        noised_mel = self.q_sample(x, t, noise)
        epsilon = self.denoise_fn(
            noised_mel, t, features, x_masks=x_masks, cond_masks=cond_masks
        )

        if x_masks is not None:
            keep = ~x_masks[:, :, None]
            noise = jnp.where(keep, noise, 0.0)
            epsilon = jnp.where(keep, epsilon, 0.0)
            noised_mel = jnp.where(keep, noised_mel, 0.0)

        loss = mel_loss(self.noise_loss, noise, epsilon)

        return dict(loss=loss, noised_mels=noised_mel, epsilon=epsilon, t=t)

    # -- samplers -----------------------------------------------------------

    def _sample_naive(self, x, denoise, ts, rng):
        """DDPM ancestral sampling as one scan (reference
        noise_predictor.py:19-105, diffusion.py:246-253)."""
        c = self.coeffs
        tables = {
            "sqrt_recip": jnp.asarray(c.sqrt_recip_alphas_cumprod, jnp.float32),
            "sqrt_recipm1": jnp.asarray(c.sqrt_recipm1_alphas_cumprod, jnp.float32),
            "mean1": jnp.asarray(c.posterior_mean_coef1, jnp.float32),
            "mean2": jnp.asarray(c.posterior_mean_coef2, jnp.float32),
            "log_var": jnp.asarray(c.posterior_log_variance_clipped, jnp.float32),
        }

        def body(carry, t):
            x, rng = carry
            rng, step_rng = jax.random.split(rng)

            eps = denoise(x, t[None].repeat(x.shape[0]))
            x0 = tables["sqrt_recip"][t] * x - tables["sqrt_recipm1"][t] * eps
            x0 = jnp.clip(x0, -1.0, 1.0)

            mean = tables["mean1"][t] * x0 + tables["mean2"][t] * x
            noise = jax.random.normal(step_rng, x.shape, jnp.float32)
            nonzero = (t > 0).astype(jnp.float32)
            x = mean + nonzero * jnp.exp(0.5 * tables["log_var"][t]) * noise
            return (x, rng), None

        (x, _), _ = jax.lax.scan(body, (x, rng), ts)
        return x

    def _sample_plms(self, x, denoise, ts, sampler_interval):
        """PLMS multistep sampling as one scan (reference
        noise_predictor.py:107-148, diffusion.py:269-311).

        Carry holds a fixed 3-slot noise history ring + stage counter; the
        Adams–Bashforth stage is selected with ``lax.switch``.
        """
        acp = jnp.asarray(self.coeffs.alphas_cumprod, jnp.float32)

        def transfer(x, noise, t, t_prev):
            a_t, a_prev = acp[t], acp[t_prev]
            a_t_sq, a_prev_sq = jnp.sqrt(a_t), jnp.sqrt(a_prev)
            x_delta = (a_prev - a_t) * (
                (1.0 / (a_t_sq * (a_t_sq + a_prev_sq))) * x
                - 1.0
                / (
                    a_t_sq
                    * (
                        jnp.sqrt((1 - a_prev) * a_t)
                        + jnp.sqrt((1 - a_t) * a_prev)
                    )
                )
                * noise
            )
            return x + x_delta

        def body(carry, t):
            x, noise_hist, stage = carry
            t_prev = jnp.maximum(t - sampler_interval, 0)
            tb = t[None].repeat(x.shape[0])

            noise_pred = denoise(x, tb)

            def stage0(_):
                x_pred = transfer(x, noise_pred, t, t_prev)
                noise_prev = denoise(x_pred, t_prev[None].repeat(x.shape[0]))
                return (noise_pred + noise_prev) / 2

            def stage1(_):
                return (3 * noise_pred - noise_hist[2]) / 2

            def stage2(_):
                return (23 * noise_pred - 16 * noise_hist[2] + 5 * noise_hist[1]) / 12

            def stage3(_):
                return (
                    55 * noise_pred
                    - 59 * noise_hist[2]
                    + 37 * noise_hist[1]
                    - 9 * noise_hist[0]
                ) / 24

            noise_prime = jax.lax.switch(
                jnp.minimum(stage, 3), [stage0, stage1, stage2, stage3], None
            )

            # shift ring: [old0, old1, old2] -> [old1, old2, new]
            noise_hist = jnp.concatenate(
                [noise_hist[1:], noise_pred[None]], axis=0
            )
            x = transfer(x, noise_prime, t, t_prev)
            return (x, noise_hist, stage + 1), None

        noise_hist0 = jnp.zeros((3,) + x.shape, jnp.float32)
        (x, _, _), _ = jax.lax.scan(body, (x, noise_hist0, jnp.int32(0)), ts)
        return x

    def _sample_unipc(self, x, denoise, steps, t_start=None):
        """UniPC multistep sampling (orders 1-3, variant bh2 default / bh1
        via config), all coefficients precomputed (see ``unipc_step_table``).
        One denoiser eval per step. The scan carry holds a fixed 2-slot
        model-output history (the reference keeps Python lists,
        uni_pc.py:741-790)."""
        table = unipc_step_table(
            self.coeffs,
            steps,
            t_start,
            variant=self.unipc_variant,
            order=self.unipc_order,
        )
        jt = {k: jnp.asarray(v) for k, v in table.items()}

        def model_x0(x, grid_idx):
            """data-prediction model at grid point (uni_pc.py:341-352)."""
            t_model = jt["model_times"][grid_idx]
            tb = t_model[None].repeat(x.shape[0])
            noise = denoise(x, tb)
            alpha_t = jt["alpha_in"][grid_idx]
            sigma_t = jt["sigma_in"][grid_idx]
            return (x - sigma_t * noise) / alpha_t

        m0 = model_x0(x, 0)
        # unused history slots stay inert: their inv_rk entries are 0
        m_prev1 = m0
        m_prev2 = m0

        def body(carry, i):
            x, m0, m_prev1, m_prev2 = carry
            D1s_0 = (m_prev1 - m0) * jt["inv_rk"][i, 0]
            D1s_1 = (m_prev2 - m0) * jt["inv_rk"][i, 1]

            x_t_ = jt["c_x"][i] * x + jt["c_m0"][i] * m0
            x_pred = x_t_ + jt["c_pred"][i, 0] * D1s_0 + jt["c_pred"][i, 1] * D1s_1

            # corrector (runs on steps 1..steps-1)
            m_t = model_x0(x_pred, i + 1)
            D1_t = m_t - m0
            x_new = (
                x_t_
                + jt["c_corr"][i, 0] * D1s_0
                + jt["c_corr"][i, 1] * D1s_1
                + jt["c_corr_D1t"][i] * D1_t
            )

            return (x_new, m_t, m0, m_prev1), None

        if steps > 1:
            (x, m0, m_prev1, m_prev2), _ = jax.lax.scan(
                body, (x, m0, m_prev1, m_prev2), jnp.arange(steps - 1)
            )

        # final step: order-1 predictor, no corrector (uni_pc.py:775-781)
        i = steps - 1
        x = (
            jt["c_x"][i] * x
            + jt["c_m0"][i] * m0
            + jt["c_pred"][i, 0] * (m_prev1 - m0) * jt["inv_rk"][i, 0]
            + jt["c_pred"][i, 1] * (m_prev2 - m0) * jt["inv_rk"][i, 1]
        )
        return x

    # -- inference entry ----------------------------------------------------

    def __call__(
        self,
        features,
        sampler_interval: Optional[int] = None,
        skip_steps: int = 0,
        original_mel: Optional[jax.Array] = None,
        noise_predictor: Optional[str] = None,
        x_masks: Optional[jax.Array] = None,
        cond_masks: Optional[jax.Array] = None,
    ):
        """Full reverse diffusion (reference diffusion.py:196-313).

        ``sampler_interval``, ``skip_steps``, ``noise_predictor`` are static
        (Python) arguments — each combination compiles once.
        Returns denormalized mel [B, T, M].
        """
        if sampler_interval is None:
            sampler_interval = self.sampler_interval
        if noise_predictor is None:
            noise_predictor = self._predictor
        noise_predictor = noise_predictor.lower()

        rng = self.make_rng("diffusion")
        rng, init_rng, skip_rng = jax.random.split(rng, 3)

        if original_mel is None:
            # mel length comes from x_masks when the condition is not
            # frame-aligned (e.g. token conditions, reference
            # diffusion.py:219-222)
            t_ref = x_masks if x_masks is not None else features
            shape = (features.shape[0], t_ref.shape[1], self.mel_channels)
            x = jax.random.normal(init_rng, shape, jnp.float32)
        else:
            x = self.norm_spec(original_mel)

        if skip_steps:
            # shallow diffusion warm start (reference diffusion.py:227-232)
            t = jnp.full((x.shape[0],), self.timesteps - skip_steps, jnp.int32)
            x = self.q_sample(x, t, jax.random.normal(skip_rng, x.shape))

        ts = np.arange(0, self.timesteps - skip_steps, sampler_interval)[::-1]
        ts = jnp.asarray(ts.copy(), jnp.int32)

        # hoist the per-block conditioner projections out of the sampling
        # scan when the denoiser supports it (constant across timesteps)
        if hasattr(self.denoise_fn, "project_conditioner"):
            cond_stack = self.denoise_fn.project_conditioner(features, cond_masks)

            def denoise(xt, tb):
                return self.denoise_fn(
                    xt, tb, cond_stack, x_masks=x_masks, cond_is_projected=True
                )

        else:
            def denoise(xt, tb):
                return self.denoise_fn(
                    xt, tb, features, x_masks=x_masks, cond_masks=cond_masks
                )

        if noise_predictor == "naive":
            x = self._sample_naive(x, denoise, ts, rng)
        elif noise_predictor == "plms":
            x = self._sample_plms(x, denoise, ts, sampler_interval)
        elif noise_predictor == "unipc":
            steps = self.timesteps // sampler_interval
            t_start = None
            if skip_steps:
                # shallow diffusion: solve only from the warm-start time.
                # DELIBERATE DEVIATION from the reference: its
                # UNIPCNoisePredictor always solves the full [1, 1/N] range
                # regardless of skip_steps (uni_pc.py sample() t_start=1),
                # re-denoising from t=1 a state that was only noised to
                # t=(T-skip)/T. Solving from the warm-start noise level is
                # mathematically consistent with q_sample above; outputs
                # differ numerically from the reference for skip_steps>0
                # with unipc (parity audits: expected, not a regression).
                steps = max((self.timesteps - skip_steps) // sampler_interval, 2)
                t_start = (self.timesteps - skip_steps) / self.timesteps
            x = self._sample_unipc(x, denoise, steps, t_start)
        else:
            raise NotImplementedError(
                f"Unknown noise predictor: {noise_predictor}"
            )

        return self.denorm_spec(x)
