"""Space-to-depth (blocked) 1-D convolutions for MXU lane occupancy.

A stride-1/strided/transposed 1-D conv at a tiny channel count starves the
TPU MXU: the 128-lane systolic array sees C=16/32/64 of 128 in both the
contraction and output dims (measured 4.6 TFLOPS at C=16 vs 139 at C=256 on
the NSF-HiFiGAN resblock fans), and the ``[T, C<128]`` activation layout
pads up to 8x in VMEM tiles. Any such conv is a banded linear map over
samples; reshaping activations to ``[B, T/s, s*C]`` (pick ``s*C >= 128``)
and scattering the small kernel into a block-Toeplitz
``[Kb, s_in*Cin, s_out*Cout]`` kernel turns every tap into a full-lane GEMM.
The FLOP blowup (``Kb*s/k``, ~2-8x) loses to the utilization win: measured
1.45x/2.41x/3.25x on C=64/32/16 fans, and 2.6x on the full NSF-HiFiGAN
vocoder once the tail levels chain the blocked layout end-to-end (see
docs/pages/architecture.md).

Each op type reduces to a static list of ``(out_slot, in_slot_offset, tap)``
triples; one scatter builds the blocked kernel from them. The scatter acts
on kernel *parameters* inside jit (traced once per compile), so param
trees, checkpoints, and converters are untouched, and gradients flow for
GAN training.

Used by ``models/vocoders/nsf_hifigan.py`` (resblock fans, polyphase
upsamplers, source-injection convs, conv_post) and
``models/vocoders/refinegan.py``. No reference analog — the torch/CUDA
reference relies on cuDNN's small-channel conv paths
(``fish_diffusion/modules/vocoders/nsf_hifigan/models.py:27-158``).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def conv_triples(k: int, dilation: int, s: int, pad: int | None = None):
    """Stride-1 dilated conv: out[n] = sum_a in[n - pad + d*a] W[a]."""
    if pad is None:
        pad = (k * dilation - dilation) // 2
    return [
        (n, n - pad + dilation * a, a) for n in range(s) for a in range(k)
    ]


def convtranspose_triples(k: int, u: int, pad: int, s_in: int):
    """Transposed conv, stride u (torch semantics: out[n] += in[m] W[w]
    where w = n - m*u + pad). Output block = u * s_in slots."""
    triples = []
    for n in range(u * s_in):
        for w in range(k):
            m_num = n - w + pad
            if m_num % u == 0:
                triples.append((n, m_num // u, w))
    return triples


def strided_triples(k: int, stride: int, pad: int, s_out: int):
    """Strided conv: out[n] = sum_w in[n*stride - pad + w] W[w].
    Input slots are samples (in-block = stride * s_out samples)."""
    return [
        (n, n * stride - pad + w, w) for n in range(s_out) for w in range(k)
    ]


def scatter_blocked_kernel(taps, triples, s_in: int, s_out: int):
    """taps [k, Cin, Cout] -> block-Toeplitz [Kb, s_in*Cin, s_out*Cout]
    plus the blocked conv's (pad_left, pad_right)."""
    cin, cout = taps.shape[1], taps.shape[2]
    qs = [m // s_in for (_, m, _) in triples]
    qmin, qmax = min(qs), max(qs)
    kb = qmax - qmin + 1
    q_i = np.asarray([m // s_in - qmin for (_, m, _) in triples], np.int32)
    j_i = np.asarray([m % s_in for (_, m, _) in triples], np.int32)
    n_i = np.asarray([n for (n, _, _) in triples], np.int32)
    w_i = np.asarray([w for (_, _, w) in triples], np.int32)
    wb = jnp.zeros((kb, s_in, cin, s_out, cout), taps.dtype)
    wb = wb.at[q_i, j_i, :, n_i, :].add(taps[w_i])
    return wb.reshape(kb, s_in * cin, s_out * cout), (-qmin, qmax)


def blocked_apply(xb, taps, bias, triples, s_in, s_out, dtype):
    """Run one blocked conv: xb [B, NB, s_in*Cin] -> [B, NB', s_out*Cout]."""
    wb, (pl, pr) = scatter_blocked_kernel(taps, triples, s_in, s_out)
    yb = jax.lax.conv_general_dilated(
        xb.astype(dtype),
        wb.astype(dtype),
        window_strides=(1,),
        padding=[(pl, pr)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        yb = yb + jnp.tile(bias, s_out).astype(dtype)
    return yb


def blocked_apply_2d(
    xb, taps, bias, triples, s_in, s_out, dtype, t_pad, block_stride=1
):
    """Blocked conv over the SECOND spatial axis of a 2-D NHWC conv.

    xb ``[B, TT, NB, s_in*Cin]``; taps ``[kt, kf, Cin, Cout]`` scattered
    along the W (blocked) axis into ``[kt, Kb, s_in*Cin, s_out*Cout]``;
    the H axis stays a plain conv dim (kernel kt, stride 1, padding
    ``t_pad``). ``block_stride`` strides the conv in block units (e.g. a
    stride-2 frequency conv with s_in == s_out uses block_stride=2).
    """
    kt = taps.shape[0]
    cin, cout = taps.shape[2], taps.shape[3]
    qs = [m // s_in for (_, m, _) in triples]
    qmin, qmax = min(qs), max(qs)
    kb = qmax - qmin + 1
    q_i = np.asarray([m // s_in - qmin for (_, m, _) in triples], np.int32)
    j_i = np.asarray([m % s_in for (_, m, _) in triples], np.int32)
    n_i = np.asarray([n for (n, _, _) in triples], np.int32)
    w_i = np.asarray([w for (_, _, w) in triples], np.int32)

    taps2 = jnp.moveaxis(taps, 0, -1)  # [kf, cin, cout, kt]
    wb = jnp.zeros((kb, s_in, cin, s_out, cout, kt), taps.dtype)
    wb = wb.at[q_i, j_i, :, n_i, :, :].add(taps2[w_i])
    wb = jnp.moveaxis(wb, -1, 0).reshape(kt, kb, s_in * cin, s_out * cout)

    yb = jax.lax.conv_general_dilated(
        xb.astype(dtype),
        wb.astype(dtype),
        window_strides=(1, block_stride),
        padding=[tuple(t_pad), (-qmin, qmax)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        yb = yb + jnp.tile(bias, s_out).astype(dtype)
    return yb


def blocked_apply_grouped(
    x, taps, bias, k: int, stride: int, groups: int, s_in: int, dtype
):
    """Grouped 1-D conv with time folded into the per-group contraction.

    A grouped conv's MXU problem is different from the small-channel one:
    total channels may be large (128-1024) but the *per-group* contraction
    (``Cin/g`` = 8-64 here) starves the systolic array, and XLA's TPU
    lowering of ``feature_group_count`` pays for it (measured: the MSD's
    k=41 grouped layers run 3-6x below the dense-layer FLOP rate).
    Folding ``s_in`` samples into each group's channel dim (group-major
    layout ``[B, T/s, G * s_in*Cg]``) and scattering the taps into a
    block-Toeplitz grouped kernel lifts the per-group contraction to
    ``s_in*Cg >= 128`` lanes. Measured wins on the MSD layers: 1.28x /
    1.42x / 1.34x (L1/L2/L5); the already-wide layers lose to the FLOP
    blowup and stay plain.

    x ``[B, T, C]``, taps ``[k, C/g, Cout]`` (plain grouped-conv params),
    pad = k//2 (same semantics as the plain layer). Returns
    ``[B, T/stride, Cout]`` with channels in plain (g, cg) order.
    """
    b, t, c = x.shape
    cout = taps.shape[2]
    cg_in, cg_out = c // groups, cout // groups
    s_out = max(s_in // stride, 1)
    if stride == 1:
        triples = conv_triples(k, 1, s_in, pad=k // 2)
    else:
        triples = strided_triples(k, stride, k // 2, s_out)
    qs = [m // s_in for (_, m, _) in triples]
    qmin, qmax = min(qs), max(qs)
    kb = qmax - qmin + 1
    q_i = np.asarray([m // s_in - qmin for (_, m, _) in triples], np.int32)
    j_i = np.asarray([m % s_in for (_, m, _) in triples], np.int32)
    n_i = np.asarray([n for (n, _, _) in triples], np.int32)
    w_i = np.asarray([w for (_, _, w) in triples], np.int32)

    wg = taps.reshape(k, cg_in, groups, cg_out)
    wb = jnp.zeros((kb, s_in, cg_in, groups, s_out, cg_out), taps.dtype)
    wb = wb.at[q_i, j_i, :, :, n_i, :].add(wg[w_i])
    wb = wb.reshape(kb, s_in * cg_in, groups * s_out * cg_out)

    nb = t // s_in
    xb = x.reshape(b, nb, s_in, groups, cg_in).transpose(0, 1, 3, 2, 4)
    xb = xb.reshape(b, nb, groups * s_in * cg_in)
    yb = jax.lax.conv_general_dilated(
        xb.astype(dtype),
        wb.astype(dtype),
        window_strides=(1,),
        padding=[(-qmin, qmax)],
        feature_group_count=groups,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    y = yb.reshape(b, nb, groups, s_out, cg_out).transpose(0, 1, 3, 2, 4)
    y = y.reshape(b, nb * s_out, cout)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


class ConvParams(nn.Module):
    """Parameter container matching ``nn.Conv``'s tree (kernel + bias).

    Lets a blocked path declare EXACTLY the params a plain ``nn.Conv`` of
    the same name would, so checkpoints/converters see one layout.
    """

    kernel_shape: Tuple[int, ...]
    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, self.kernel_shape)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class WNScale(nn.Module):
    """Scale param matching ``nn.WeightNorm``'s tree for a wrapped conv
    (flax stores it as ``{wrapper_name: {"<conv_name>/kernel/scale": g}}``
    with the conv itself a *sibling* module)."""

    conv_name: str
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            f"{self.conv_name}/kernel/scale",
            nn.initializers.ones_init(),
            (self.features,),
        )


def weight_norm_kernel(kernel, scale, eps: float = 1e-12):
    """Fold weight-norm: w = g * v / ||v||, norm per output feature
    (flax ``nn.WeightNorm`` feature_axes=-1 semantics)."""
    norm = jnp.sqrt(
        jnp.sum(jnp.square(kernel), axis=tuple(range(kernel.ndim - 1)),
                keepdims=True)
        + eps
    )
    return kernel * (scale / norm)
