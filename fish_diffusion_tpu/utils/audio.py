"""Host-side audio utilities.

``slice_audio`` has capability parity with the reference
``fish_diffusion/utils/audio.py:112-167`` (silence-split with max-duration
chunking) implemented librosa-free: frame-RMS dB gating equivalent to
``librosa.effects.split``. WAV IO uses the stdlib (no soundfile in the
image).
"""

from __future__ import annotations

import math
import wave
from typing import Iterable, Tuple

import numpy as np


def _frame_db(audio: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """Per-frame peak dB relative to the signal max (librosa.effects.split
    gates on amplitude relative to max)."""
    if audio.ndim > 1:
        audio = np.max(np.abs(audio), axis=tuple(range(audio.ndim - 1)))
    else:
        audio = np.abs(audio)

    n_frames = max(1 + (len(audio) - frame_length) // hop_length, 1)
    frames = np.zeros(n_frames, np.float32)
    for i in range(n_frames):
        seg = audio[i * hop_length : i * hop_length + frame_length]
        frames[i] = np.sqrt(np.mean(seg**2) + 1e-12)

    ref = frames.max() + 1e-12
    return 20.0 * np.log10(frames / ref + 1e-12)


def split_silence(
    audio: np.ndarray,
    top_db: int = 60,
    frame_length: int = 2048,
    hop_length: int = 512,
):
    """Non-silent intervals [(start_sample, end_sample)]
    (librosa.effects.split-equivalent)."""
    db = _frame_db(audio, frame_length, hop_length)
    non_silent = db > -top_db

    intervals = []
    in_run = False
    run_start = 0
    for i, ns in enumerate(non_silent):
        if ns and not in_run:
            in_run, run_start = True, i
        elif not ns and in_run:
            in_run = False
            intervals.append((run_start * hop_length, min(i * hop_length + frame_length, len(audio))))
    if in_run:
        intervals.append((run_start * hop_length, len(audio)))

    return intervals


def slice_audio(
    audio: np.ndarray,
    rate: int,
    max_duration: float = 30.0,
    top_db: int = 60,
    frame_length: int = 2048,
    hop_length: int = 512,
    min_silence_duration: float = 0,
) -> Iterable[Tuple[int, int]]:
    """Silence-split with max-duration chunking
    (reference utils/audio.py:112-167)."""
    intervals = split_silence(
        audio.T if audio.ndim > 1 else audio,
        top_db=top_db,
        frame_length=frame_length,
        hop_length=hop_length,
    )

    if min_silence_duration > 0:
        merged = []
        for start, end in intervals:
            if merged and merged[-1][1] + min_silence_duration * rate >= start:
                merged[-1] = (merged[-1][0], end)
            else:
                merged.append((start, end))
        intervals = merged

    for start, end in intervals:
        if end - start <= rate * max_duration:
            if end - start <= rate * 0.1:  # too short, unlikely vocal
                continue
            yield start, end
            continue

        n_chunks = math.ceil((end - start) / (max_duration * rate))
        chunk_size = math.ceil((end - start) / n_chunks)
        for i in range(start, end, chunk_size):
            yield i, i + chunk_size


def separate_vocals(audio: np.ndarray, sr: int, device=None, separate_model=None):
    """Vocal/instrumental separation hook (reference utils/audio.py:170-201
    uses htdemucs via fish_audio_preprocess).

    Uses a locally-installed demucs when available; otherwise raises with
    instructions — the learned separator's weights require network access
    this framework does not assume at runtime.
    """
    try:
        import demucs  # type: ignore  # noqa: F401
    except ImportError:
        raise RuntimeError(
            "vocal separation needs the 'demucs' package with local htdemucs "
            "weights; install it or run inference without --extract-vocals"
        )

    import torch
    from demucs import apply, pretrained  # type: ignore

    model = separate_model or pretrained.get_model("htdemucs")
    wav = np.stack([audio, audio])
    with torch.no_grad():
        sources = apply.apply_model(
            model, torch.from_numpy(wav[None]).float(), device=device or "cpu"
        )[0]
    names = model.sources
    vocals = sources[names.index("vocals")].mean(0).numpy()
    non_vocals = (
        sum(sources[i] for i, n in enumerate(names) if n != "vocals")
        .mean(0)
        .numpy()
    )
    return vocals, non_vocals


def save_wav(path, audio: np.ndarray, sample_rate: int = 44100):
    """Write mono/stereo float [-1,1] audio as 16-bit PCM WAV (stdlib)."""
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[None, :]
    pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)

    with wave.open(str(path), "wb") as w:
        w.setnchannels(pcm.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.T.tobytes())


def load_wav(path) -> Tuple[np.ndarray, int]:
    """Read a PCM WAV to float32 [-1,1] mono (stdlib)."""
    with wave.open(str(path), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)

    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width: {width}")

    if channels > 1:
        data = data.reshape(-1, channels).mean(axis=1)
    return data, sr
