"""WaveNet (DiffWave-style) denoiser, TPU-native.

Capability parity with the reference ``fish_diffusion/modules/wavenet.py:151-236``
(WaveNet: 1x1 input proj, sinusoidal step embedding + Mish MLP, N residual
gated-conv blocks with a dilation cycle, per-block conditioner 1x1 conv,
skip-sum output), re-designed for XLA:

- channels-last ``[B, T, C]`` everywhere; 1x1 convs are Dense matmuls (MXU)
- the N residual blocks run as ONE ``lax.scan`` over stacked parameters; the
  dilated k=3 conv is three shifted matmuls, with the time shift lowered
  per-regime via ``static_dilation_shifts`` (default False): a ``lax.switch``
  over static pad/slice branches for TRAINING (21% faster there —
  ``build_model(training=True)`` flips it on), a traced roll+mask for the
  forward-only sampling scan (faster in that regime; A/B in
  ``tools/ab_dilation_probe.py``, ``models/common.py:DilatedConvK3``). The
  param tree is identical either way; the whole 20-block stack compiles to a
  single block body in both
- optional rematerialization (``jax.checkpoint``) per block for training
  memory, replacing torch gradient checkpointing
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import DENOISERS
from .common import (
    Conv1x1,
    DilatedConvK3,
    LinearNorm,
    diffusion_embedding,
    mish,
)

Dtype = Any


class ResidualBlock(nn.Module):
    """One WaveNet residual block (reference wavenet.py:83-120).

    Called under ``nn.scan``: carry is ``(x, skip_sum)``; ``dilation`` is the
    per-step scan input; conditioner and step embedding are broadcast.
    """

    residual_channels: int
    use_linear_bias: bool = False
    cond_is_projected: bool = False
    dtype: Dtype = jnp.float32
    # static dilation set of the cycle; the scan input is then the INDEX
    # into it (see DilatedConvK3 — static shifts beat traced roll by 21%)
    dilation_values: Optional[tuple] = None

    @nn.compact
    def __call__(self, carry, dilation, conditioner, step_emb):
        x, skip_sum = carry
        r = self.residual_channels

        step = LinearNorm(r, self.use_linear_bias, dtype=self.dtype, name="diffusion_projection")(step_emb)
        y = x + step[:, None, :]

        y = DilatedConvK3(
            2 * r,
            use_bias=True,
            dtype=self.dtype,
            dilation_values=self.dilation_values,
            name="conv_layer",
        )(y, dilation)
        if self.cond_is_projected:
            # sampling fast path: the per-block conditioner projection was
            # hoisted out of the reverse-diffusion scan (the condition is
            # constant across timesteps); ``conditioner`` is already [.., 2r]
            y = y + conditioner
        else:
            y = y + Conv1x1(2 * r, dtype=self.dtype, name="conditioner_projection")(conditioner)

        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)

        y = Conv1x1(2 * r, dtype=self.dtype, name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)

        new_x = (x + residual) * (1.0 / math.sqrt(2.0))
        return (new_x, skip_sum + skip), None


class SpectrogramUpsampler(nn.Module):
    """Frame-rate -> sample-rate conditioner upsampling for raw-audio
    DiffWave conditioning (reference wavenet.py:123-149; defined there for
    hop 256/512, unused by the mel-space archs — kept for capability parity).

    TPU-native: two channels-last 2-D transposed convs over [B, T, M, 1]
    (time x mel-bin plane), leaky-relu(0.4) after each, so the time axis
    expands 16x16 / 32x16 on the MXU rather than via gathers.
    """

    hop_size: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel [B, T, M] -> [B, T*hop, M]."""
        if self.hop_size == 256:
            k1, s1, p1 = 32, 16, 8
        elif self.hop_size == 512:
            k1, s1, p1 = 64, 32, 16
        else:
            raise ValueError(f"Unsupported hop_size: {self.hop_size}")

        x = mel[..., None]  # [B, T, M, 1]
        x = nn.ConvTranspose(
            1, kernel_size=(k1, 3), strides=(s1, 1),
            padding=[(k1 - 1 - p1, k1 - 1 - p1), (1, 1)],
            transpose_kernel=True, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.leaky_relu(x, 0.4)
        x = nn.ConvTranspose(
            1, kernel_size=(32, 3), strides=(16, 1),
            padding=[(32 - 1 - 8, 32 - 1 - 8), (1, 1)],
            transpose_kernel=True, dtype=self.dtype, name="conv2",
        )(x)
        x = nn.leaky_relu(x, 0.4)
        return x[..., 0]


@DENOISERS.register_module(name="WaveNetDenoiser")
class WaveNet(nn.Module):
    """WaveNet denoiser.

    Args mirror the reference config surface
    (``configs/_base_/archs/diff_svc_v2.py:28-35``).

    Input/output layout: ``x`` is ``[B, T, mel_channels]`` (channels-last; the
    reference uses [B, M, T]), ``conditioner`` is ``[B, T, d_encoder]``,
    ``diffusion_step`` is ``[B]``.
    """

    mel_channels: int = 128
    d_encoder: int = 256
    residual_channels: int = 512
    residual_layers: int = 20
    use_linear_bias: bool = False
    dilation_cycle: Optional[int] = None
    dtype: Dtype = jnp.float32
    remat: bool = False
    # jax.checkpoint policy name for remat=True (an attr of
    # jax.checkpoint_policies, e.g. "dots_saveable": stash only matmul
    # outputs and recompute the cheap elementwise ops in the backward —
    # the r5 trace showed plain autodiff stashes ~5 [B,T,C] tensors per
    # block, ~2.6 ms/step of pure HBM traffic at B=20 T=512). None =
    # recompute everything (classic remat).
    remat_policy: Optional[str] = None
    # lax.scan unroll factor for the residual stack: >1 lets XLA fuse
    # consecutive blocks (fewer carry round-trips through HBM per step) at
    # the cost of a proportionally larger program. Must divide
    # residual_layers. Measured on the r5 TPU run (B=20 T=512 train step):
    # see docs/artifacts/train_mfu_sweep_r05.json.
    scan_unroll: int = 1
    # static pad/slice dilation shifts (lax.switch over the cycle's static
    # dilation set) vs the traced roll+mask shift. Measured per regime on
    # v5e (tools/ab_dilation_probe.py): static wins the TRAIN step (28.9 vs
    # 30.7 ms at B=20 T=512) but LOSES the forward-only sampling scan by
    # ~20% (316 vs 253 ms per 100 evals at B=4 T=1024) — the switch blocks
    # XLA from fusing the shift into the consuming matmul when there is no
    # backward pass to amortize it. So: False (traced) is the default for
    # inference; ``build_model(..., training=True)`` flips it on. The param
    # tree is identical either way — checkpoints are interchangeable.
    static_dilation_shifts: bool = False

    def project_conditioner(
        self, conditioner: jax.Array, cond_masks: Optional[jax.Array] = None
    ) -> jax.Array:
        """Hoist the per-block conditioner projections out of a sampling
        scan: [B, T, d_enc] -> [n_layers, B, T, 2r]. The condition is
        constant across reverse-diffusion timesteps, so this runs once per
        sampling call instead of once per denoiser eval (~11% of the
        denoiser FLOPs at default sizes)."""
        conditioner = conditioner.astype(self.dtype)
        if cond_masks is not None:
            conditioner = jnp.where(cond_masks[:, :, None], 0.0, conditioner)

        p = self.variables["params"]["residual_layers"]["conditioner_projection"]["Dense_0"]
        kernel = jnp.asarray(p["kernel"], self.dtype)  # [L, d_enc, 2r]
        bias = jnp.asarray(p["bias"], self.dtype)  # [L, 2r]
        out = jnp.einsum("btc,lcr->lbtr", conditioner, kernel)
        return out + bias[:, None, None, :]

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        diffusion_step: jax.Array,
        conditioner: jax.Array,
        x_masks: Optional[jax.Array] = None,
        cond_masks: Optional[jax.Array] = None,
        cond_is_projected: bool = False,
    ) -> jax.Array:
        r = self.residual_channels
        compute_dtype = self.dtype

        x = x.astype(compute_dtype)
        conditioner = conditioner.astype(compute_dtype)

        x = Conv1x1(r, dtype=compute_dtype, name="input_projection")(x)
        x = jax.nn.relu(x)

        step = diffusion_embedding(diffusion_step, r, dtype=compute_dtype)
        step = LinearNorm(4 * r, self.use_linear_bias, dtype=compute_dtype, name="mlp_0")(step)
        step = mish(step)
        step = LinearNorm(r, self.use_linear_bias, dtype=compute_dtype, name="mlp_1")(step)

        if x_masks is not None:
            x = jnp.where(x_masks[:, :, None], 0.0, x)
        if cond_masks is not None and not cond_is_projected:
            conditioner = jnp.where(cond_masks[:, :, None], 0.0, conditioner)

        if self.dilation_cycle:
            dilations = np.array(
                [2 ** (i % self.dilation_cycle) for i in range(self.residual_layers)],
                dtype=np.int32,
            )
        else:
            dilations = np.ones(self.residual_layers, dtype=np.int32)
        # dilations are statically known here, so the scan input is the
        # INDEX into the (static) value set and the per-block shifts are a
        # lax.switch over static pad/slice branches (DilatedConvK3) —
        # measured 21% faster per train step than traced roll+mask shifts
        if self.static_dilation_shifts:
            dilation_values = tuple(
                int(d) for d in sorted(set(dilations.tolist()))
            )
            dilation_idx = np.array(
                [dilation_values.index(int(d)) for d in dilations],
                dtype=np.int32,
            )
        else:  # legacy: the scan input is the traced dilation VALUE
            dilation_values = None
            dilation_idx = dilations

        # The residual stack is ONE scanned block body; a fused Pallas
        # block kernel was measured against this path on the real chip and
        # lost (0.974x at bench shapes, B=4 T=1024 C=512 L=20 bf16) — XLA's
        # own fusion of the 4-GEMM block is already at ~70% of MXU peak.
        # See docs/pages/architecture.md "Explored and rejected".
        block = ResidualBlock
        if self.remat:
            policy = (
                getattr(jax.checkpoint_policies, self.remat_policy)
                if self.remat_policy
                else None
            )
            block = nn.remat(
                block,
                static_argnums=(),
                prevent_cse=False,
                policy=policy,
            )

        ScannedBlocks = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0, 0 if cond_is_projected else nn.broadcast, nn.broadcast),
            length=self.residual_layers,
            unroll=self.scan_unroll,
        )

        skip0 = jnp.zeros_like(x)
        (x, skip_sum), _ = ScannedBlocks(
            residual_channels=r,
            use_linear_bias=self.use_linear_bias,
            cond_is_projected=cond_is_projected,
            dtype=compute_dtype,
            dilation_values=dilation_values,
            name="residual_layers",
        )((x, skip0), jnp.asarray(dilation_idx), conditioner, step)

        x = skip_sum * (1.0 / math.sqrt(self.residual_layers))
        x = Conv1x1(r, dtype=compute_dtype, name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = Conv1x1(
            self.mel_channels,
            dtype=compute_dtype,
            kernel_init=nn.initializers.zeros,
            name="output_projection",
        )(x)

        if x_masks is not None:
            x = jnp.where(x_masks[:, :, None], 0.0, x)

        return x.astype(jnp.float32)
