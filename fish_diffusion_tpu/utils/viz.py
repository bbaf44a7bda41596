"""Validation visualization (parity with reference
``fish_diffusion/utils/viz.py``: plot_mel at :12, viz_synth_sample at :32).
"""

from __future__ import annotations

import numpy as np


def plot_mel(data, titles=None):
    """Stacked mel-spectrogram figure. data: list of [T, M] arrays."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(len(data), 1, squeeze=False, figsize=(12, 3 * len(data)))
    if titles is None:
        titles = [None for _ in data]

    for i, mel in enumerate(data):
        mel = np.asarray(mel).T  # [M, T] for display
        axes[i][0].imshow(mel, origin="lower", aspect="auto", interpolation="none")
        axes[i][0].set_ylim(0, mel.shape[0])
        axes[i][0].set_title(titles[i], fontsize="medium")
        axes[i][0].tick_params(labelsize="x-small")
        axes[i][0].set_anchor("W")

    plt.tight_layout()
    return fig


def viz_synth_sample(
    gt_mel,
    gt_pitch,
    predict_mel,
    predict_mel_len: int,
    gt_mel_len: int,
    vocoder=None,
    return_image: bool = False,
):
    """Build (figure, wav_reconstruction, wav_prediction) for one validation
    sample (reference utils/viz.py:32-91). Mels are [T, M] channels-last."""
    gt_mel = np.asarray(gt_mel)[:gt_mel_len]
    predict_mel = np.asarray(predict_mel)[:predict_mel_len]

    fig = plot_mel(
        [predict_mel, gt_mel, np.abs(gt_mel[: len(predict_mel)] - predict_mel[: len(gt_mel)])],
        ["Synthesized Spectrogram", "Ground-Truth Spectrogram", "Absolute Difference"],
    )

    wav_reconstruction = wav_prediction = None
    if vocoder is not None and gt_pitch is not None:
        import jax.numpy as jnp

        pitch = jnp.asarray(np.asarray(gt_pitch)[:gt_mel_len])
        wav_reconstruction = np.asarray(
            vocoder.spec2wav(jnp.asarray(gt_mel), pitch)
        )
        wav_prediction = np.asarray(
            vocoder.spec2wav(jnp.asarray(predict_mel), pitch[: len(predict_mel)])
        )

    if return_image:
        fig.canvas.draw()
        image = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
        w, h = fig.canvas.get_width_height()
        image = image.reshape(h, w, 4)[..., :3]
        import matplotlib.pyplot as plt

        plt.close(fig)
        return image, wav_reconstruction, wav_prediction

    return fig, wav_reconstruction, wav_prediction
