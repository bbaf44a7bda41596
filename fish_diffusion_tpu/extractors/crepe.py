"""CREPE learned pitch extractor, TPU-native flax port.

Capability parity with the reference
``fish_diffusion/modules/pitch_extractors/crepe.py:11-72``, which runs
torchcrepe (``torchcrepe.predict`` @16 kHz, hop 80, pad=True, batch 1024,
Viterbi decoding) followed by the README post-processing chain: median-3
filter on periodicity, −60 dB A-weighted silence gating, periodicity
threshold voicing, mean-3 filter on f0, NaN→0.

The network here is the CREPE architecture in the torchcrepe checkpoint
layout (Kim et al. 2018, "CREPE: A Convolutional Representation for Pitch
Estimation"; torchcrepe/model.py):

- 6 conv layers over 1024-sample frames; full: channels
  (1024,128,128,128,256,512), tiny: (128,16,16,16,32,64); kernel 512
  stride 4 for layer 1, kernel 64 stride 1 after; each layer =
  pad → conv → ReLU → BatchNorm(eps=1e-3) → maxpool 2
- classifier: Linear(4*C_last → 360 bins), sigmoid
- bins → cents: ``20*bin + 1997.3794084376191``; f0 = ``10*2^(cents/1200)``

TPU-native deviations (documented, deterministic):
- the whole frame→salience→Viterbi pipeline is jitted with frame-count
  buckets (multiples of 256) instead of torchcrepe's python batching
- Viterbi runs as a ``lax.scan`` forward/backtrack DP on device instead of
  librosa.sequence.viterbi on host
- no random dither is added to decoded cents (torchcrepe dithers to hide
  20-cent quantization; determinism is preferred here and the weighted
  local average below achieves sub-bin resolution)

Weights: convert torchcrepe's released ``full.pth``/``tiny.pth`` with
``tools/preprocessing/convert_crepe_checkpoint.py`` (explicit artifact
management replaces the reference's torch.hub download).
"""

from __future__ import annotations

import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..registry import PITCH_EXTRACTORS
from .pitch import BasePitchExtractor

PITCH_BINS = 360
WINDOW_SIZE = 1024
CREPE_SAMPLE_RATE = 16000
CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191

_CAPACITY_CHANNELS = {
    "full": (1024, 128, 128, 128, 256, 512),
    "tiny": (128, 16, 16, 16, 32, 64),
}
# layer 1: k=512 s=4 pad (254, 254); layers 2-6: k=64 s=1 pad (31, 32)
_KERNELS = (512, 64, 64, 64, 64, 64)
_STRIDES = (4, 1, 1, 1, 1, 1)
_PADS = ((254, 254), (31, 32), (31, 32), (31, 32), (31, 32), (31, 32))


class Crepe(nn.Module):
    """CREPE salience network. frames [B, 1024] -> sigmoid probs [B, 360].

    Channels-last; each conv lowers to an MXU GEMM. BatchNorm runs with
    converted running statistics (inference-only, like the RMVPE port).
    """

    capacity: str = "full"

    @nn.compact
    def __call__(self, frames: jax.Array) -> jax.Array:
        channels = _CAPACITY_CHANNELS[self.capacity]
        x = frames[:, :, None]  # [B, 1024, 1]
        for i, (ch, k, s, pad) in enumerate(
            zip(channels, _KERNELS, _STRIDES, _PADS)
        ):
            x = jnp.pad(x, ((0, 0), pad, (0, 0)))
            x = nn.Conv(
                ch, (k,), strides=(s,), padding="VALID", name=f"conv{i + 1}"
            )(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=True,
                epsilon=1e-3,
                name=f"conv{i + 1}_BN",
            )(x)
            x = nn.max_pool(x, (2,), strides=(2,))
        # torch: [B, C, 4, 1].permute(0, 2, 1, 3).reshape(-1, 4*C) — our
        # channels-last [B, 4, C] flattens in the same position-major order
        x = x.reshape(x.shape[0], -1)
        return jax.nn.sigmoid(nn.Dense(PITCH_BINS, name="classifier")(x))


# -- framing / decoding ------------------------------------------------------


def frame_audio_16k(audio: np.ndarray, hop_length: int) -> np.ndarray:
    """torchcrepe.core.preprocess: zero-pad WINDOW_SIZE//2 both sides,
    unfold to [n_frames, 1024] with ``n_frames = 1 + T // hop``, then
    per-frame standardize (mean 0; std with torch's N-1 divisor)."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    n_frames = 1 + len(audio) // hop_length
    padded = np.pad(audio, (WINDOW_SIZE // 2, WINDOW_SIZE // 2))
    idx = (
        np.arange(n_frames)[:, None] * hop_length
        + np.arange(WINDOW_SIZE)[None, :]
    )
    # guard: keep the unfold in-bounds for the final frame
    idx = np.minimum(idx, len(padded) - 1)
    frames = padded[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)
    frames = frames / np.maximum(1e-10, frames.std(axis=1, ddof=1, keepdims=True))
    return frames.astype(np.float32)


def frequency_to_bin(freq: float, quantize=np.floor) -> int:
    cents = 1200.0 * np.log2(freq / 10.0)
    return int(quantize((cents - CENTS_OFFSET) / CENTS_PER_BIN))


def _transition_matrix() -> np.ndarray:
    """torchcrepe.decode.viterbi's band-limited transition prior:
    max(12 - |i - j|, 0), row-normalized."""
    xx, yy = np.meshgrid(np.arange(PITCH_BINS), np.arange(PITCH_BINS))
    t = np.maximum(12 - np.abs(xx - yy), 0).astype(np.float64)
    return (t / t.sum(axis=1, keepdims=True)).astype(np.float32)


@jax.jit
def _viterbi_path(log_obs: jax.Array, log_trans: jax.Array) -> jax.Array:
    """Max-sum Viterbi over [T, S] log observations; returns the argmax
    state path [T] (librosa.sequence.viterbi semantics: uniform initial
    distribution). Forward scan keeps backpointers; reverse scan decodes.

    Called on frame-count-bucketed inputs (pad frames carry uniform
    observations) so the compile cache stays small; padding can at most
    perturb the decoded bin of the final real frame by a few bins, which
    the weighted-average decode + mean filter absorb."""
    T, S = log_obs.shape

    def fwd(delta, obs_t):
        # scores[i, j] = delta[i] + log_trans[i, j]
        scores = delta[:, None] + log_trans
        best_prev = jnp.argmax(scores, axis=0)
        delta_new = jnp.max(scores, axis=0) + obs_t
        return delta_new, best_prev

    init = -jnp.log(float(S)) + log_obs[0]
    delta_T, backptrs = jax.lax.scan(fwd, init, log_obs[1:])

    last = jnp.argmax(delta_T)

    # reverse scan emits the state at the LATER end of each transition
    # (positions 1..T-1); the final carry is the state at t=0
    def bwd(state, bp_t):
        prev = bp_t[state]
        return prev, state

    first, path_tail = jax.lax.scan(bwd, last, backptrs, reverse=True)
    return jnp.concatenate([first[None], path_tail])


def _nan_windows(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """[T] -> [T, win] reflect-padded sliding windows (torchcrepe.filter)."""
    pad = win // 2
    xp = jnp.pad(x, (pad, pad), mode="reflect")
    idx = jnp.arange(x.shape[0])[:, None] + jnp.arange(win)[None, :]
    return xp[idx]


def median_filter(x: jnp.ndarray, win: int = 3) -> jnp.ndarray:
    """NaN-aware sliding median (torchcrepe.filter.median)."""
    w = _nan_windows(x, win)
    # NaN-aware: replace NaN with +inf, sort, pick middle of the valid count
    valid = ~jnp.isnan(w)
    n_valid = valid.sum(axis=1)
    sorted_w = jnp.sort(jnp.where(valid, w, jnp.inf), axis=1)
    mid = jnp.maximum(n_valid - 1, 0) // 2
    lo = jnp.take_along_axis(sorted_w, mid[:, None], axis=1)[:, 0]
    hi = jnp.take_along_axis(
        sorted_w, (jnp.maximum(n_valid - 1, 0) - mid)[:, None] + mid[:, None], axis=1
    )[:, 0]
    med = jnp.where(n_valid % 2 == 1, lo, 0.5 * (lo + hi))
    return jnp.where(n_valid > 0, med, jnp.nan)


def mean_filter(x: jnp.ndarray, win: int = 3) -> jnp.ndarray:
    """NaN-aware sliding mean (torchcrepe.filter.mean)."""
    w = _nan_windows(x, win)
    valid = ~jnp.isnan(w)
    s = jnp.where(valid, w, 0.0).sum(axis=1)
    n = valid.sum(axis=1)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), jnp.nan)


def a_weighted_loudness(
    audio: np.ndarray, sample_rate: int, hop_length: int, n_frames: int
) -> np.ndarray:
    """Per-frame A-weighted loudness in dBFS.

    Role parity with torchcrepe.loudness.a_weighted feeding
    ``threshold.Silence(-60)`` (reference crepe.py:66): frames quieter than
    −60 dB(A) are forced unvoiced. Implementation deviation (documented):
    torchcrepe averages per-bin dB values; here loudness is the IEC-61672
    A-weighted TOTAL frame energy referenced to a full-scale sine (0 dBFS),
    floored at −100 dB — the same gate semantics with a scale that directly
    reads as dBFS."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    padded = np.pad(audio, (WINDOW_SIZE // 2, WINDOW_SIZE // 2))
    idx = (
        np.arange(n_frames)[:, None] * hop_length
        + np.arange(WINDOW_SIZE)[None, :]
    )
    idx = np.minimum(idx, len(padded) - 1)
    window = np.hanning(WINDOW_SIZE)
    frames = padded[idx] * window
    # scale so a full-scale sine peaks at 0 dBFS
    mag = np.abs(np.fft.rfft(frames, axis=1)) * (2.0 / window.sum())

    freqs = np.fft.rfftfreq(WINDOW_SIZE, 1.0 / sample_rate)
    f2 = np.maximum(freqs, 1e-6) ** 2
    ra = (12194.0**2 * f2**2) / (
        (f2 + 20.6**2)
        * np.sqrt((f2 + 107.7**2) * (f2 + 737.9**2))
        * (f2 + 12194.0**2)
    )
    a_weight_db = 2.0 + 20.0 * np.log10(np.maximum(ra, 1e-30))

    power = (mag**2) * 10.0 ** (a_weight_db[None, :] / 10.0)
    loudness = 10.0 * np.log10(np.maximum(power.sum(axis=1), 1e-10))
    return np.maximum(loudness, -100.0)


@PITCH_EXTRACTORS.register_module(name="CrepePitchExtractor")
class CrepePitchExtractor(BasePitchExtractor):
    """reference crepe.py:11-72 (torchcrepe full/tiny @16k hop 80)."""

    def __init__(
        self,
        hop_length: int = 512,
        f0_min: float = 50.0,
        f0_max: float = 1100.0,
        threshold: float = 0.05,
        keep_zeros: bool = False,
        model: str = "full",
        use_fast_filters: bool = True,  # parity kwarg; filters always fused
        checkpoint_path: Optional[str] = None,
        random_init: bool = False,
        decoder: str = "viterbi",
    ):
        super().__init__(hop_length, f0_min, f0_max, keep_zeros)
        assert model in ("full", "tiny"), model
        assert decoder in ("viterbi", "argmax"), decoder
        self.threshold = threshold
        self.capacity = model
        self.decoder = decoder
        self.model = Crepe(capacity=model)
        self.crepe_hop = 80  # 5 ms at 16 kHz (reference crepe.py:53)

        self.variables = None
        if checkpoint_path:
            with open(checkpoint_path, "rb") as f:
                self.variables = pickle.load(f)
        if random_init and self.variables is None:
            self.init_random()

        self._log_trans = jnp.log(
            jnp.maximum(jnp.asarray(_transition_matrix()), 1e-12)
        )
        self._forward = jax.jit(lambda v, fr: self.model.apply(v, fr))

    def init_random(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # jitted: eager flax init runs op-by-op over the device tunnel
        self.variables = jax.jit(self.model.init)(rng, jnp.zeros((1, WINDOW_SIZE)))
        return self.variables

    # -- decode ---------------------------------------------------------------

    def _decode(self, probs: jnp.ndarray, n_frames: int) -> tuple:
        """probs [T_bucket, 360] (sigmoid activations, band-masked, padded
        past ``n_frames``) -> (bins [n], periodicity [n]).

        Viterbi matches torchcrepe.decode.viterbi: the sigmoid activations
        are treated as logits and softmax-normalized into observation
        probabilities, band transition prior, uniform initial distribution.
        Pad frames get uniform observations so bucketing cannot steer the
        path."""
        if self.decoder == "viterbi":
            log_obs = jax.nn.log_softmax(probs, axis=1)
            pad_row = jnp.full((probs.shape[1],), -jnp.log(float(probs.shape[1])))
            is_pad = jnp.arange(probs.shape[0]) >= n_frames
            log_obs = jnp.where(is_pad[:, None], pad_row[None, :], log_obs)
            bins = _viterbi_path(log_obs, self._log_trans)[:n_frames]
        else:
            bins = jnp.argmax(probs[:n_frames], axis=1)
        periodicity = jnp.take_along_axis(
            jnp.where(jnp.isneginf(probs[:n_frames]), 0.0, probs[:n_frames]),
            bins[:, None],
            axis=1,
        )[:, 0]
        return bins, periodicity

    def _bins_to_f0(self, bins: jnp.ndarray, probs: jnp.ndarray) -> jnp.ndarray:
        """Weighted local average of cents around the decoded bin (±4 bins,
        the CREPE paper's sub-bin decode; replaces torchcrepe's dither)."""
        T = bins.shape[0]
        sal = jnp.pad(jnp.where(jnp.isneginf(probs), 0.0, probs), ((0, 0), (4, 4)))
        idx = bins[:, None] + 4 + jnp.arange(-4, 5)[None, :]
        w = jnp.take_along_axis(sal, idx, axis=1)
        cents_map = CENTS_PER_BIN * (jnp.arange(PITCH_BINS + 8) - 4) + CENTS_OFFSET
        cents = (w * cents_map[idx]).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1e-9)
        return 10.0 * 2.0 ** (cents / 1200.0)

    # -- end-to-end -----------------------------------------------------------

    def predict_16k(self, audio16k: np.ndarray) -> np.ndarray:
        """audio @16 kHz -> f0 at 5 ms frames (reference crepe.py:52-71)."""
        assert self.variables is not None, (
            "CREPE has no weights; convert torchcrepe's full.pth/tiny.pth "
            "with tools/preprocessing/convert_crepe_checkpoint.py or pass "
            "random_init=True for testing"
        )
        frames = frame_audio_16k(audio16k, self.crepe_hop)
        n_frames = frames.shape[0]

        # frame-count bucket (multiple of 256) for a stable jit cache
        bucket = 256 * ((n_frames - 1) // 256 + 1)
        frames = np.pad(frames, ((0, bucket - n_frames), (0, 0)))

        probs = self._forward(self.variables, jnp.asarray(frames))
        probs = np.asarray(probs)[:n_frames]  # [T, 360]

        # mask bins outside [f0_min, f0_max] (torchcrepe.core.postprocess)
        min_bin = max(frequency_to_bin(self.f0_min), 0)
        max_bin = min(frequency_to_bin(self.f0_max, np.ceil), PITCH_BINS)
        masked = np.full((bucket, PITCH_BINS), -np.inf, np.float32)
        masked[:n_frames, min_bin:max_bin] = probs[:, min_bin:max_bin]
        masked_j = jnp.asarray(masked)

        bins, pd = self._decode(masked_j, n_frames)
        f0 = self._bins_to_f0(bins, masked_j[:n_frames])

        # post-process chain (reference crepe.py:64-70)
        pd = median_filter(pd, 3)
        loudness = a_weighted_loudness(
            audio16k, CREPE_SAMPLE_RATE, self.crepe_hop, n_frames
        )
        pd = jnp.where(jnp.asarray(loudness) < -60.0, 0.0, pd)
        f0 = jnp.where(pd < self.threshold, jnp.nan, f0)
        f0 = mean_filter(f0, 3)
        f0 = jnp.where(jnp.isnan(f0), 0.0, f0)
        return np.asarray(f0)

    def __call__(self, x, sampling_rate=44100, pad_to=None):
        from .feature import resample_linear

        audio = np.asarray(x, np.float32).reshape(-1)
        if sampling_rate != CREPE_SAMPLE_RATE:
            audio = resample_linear(audio, sampling_rate, CREPE_SAMPLE_RATE)
        f0 = self.predict_16k(audio)
        return self.post_process(x, sampling_rate, f0, pad_to)
