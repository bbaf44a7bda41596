"""npy-dict datasets (parity with reference ``fish_diffusion/datasets/naive.py``).

Each sample is one ``.npy`` file holding a pickled dict (the preprocessing
artifact contract, reference ``tools/preprocessing/extract_features.py:106``).
Declarative ``processing_pipeline`` / ``collating_pipeline`` interpreted by
``transform_pipeline``; collation emits ``*_lens``/``*_max_len`` and pads to
frame buckets for static jit shapes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..registry import DATASETS
from .utils import DEFAULT_BUCKET, list_files, transform_pipeline


@DATASETS.register_module()
class NaiveDataset:
    processing_pipeline = []
    collating_pipeline = []
    bucket = DEFAULT_BUCKET

    def __init__(self, path="dataset", speaker_id=0):
        self.paths = list_files(path, {".npy"}, recursive=True)
        self.dataset_path = Path(path)
        self.speaker_id = speaker_id

        assert len(self.paths) > 0, f"No files found in {path}, check your path."

    def __len__(self):
        return len(self.paths)

    def get_item(self, idx):
        x = np.load(self.paths[idx], allow_pickle=True).item()
        x["speaker"] = self.speaker_id
        return transform_pipeline(self.processing_pipeline, x)

    def __getitem__(self, idx):
        try:
            return self.get_item(idx)
        except Exception:
            print(f"Error when loading {self.paths[idx]}, skipping...")
            return None

    @classmethod
    def collate_fn(cls, data):
        data = [x for x in data if x is not None]
        return transform_pipeline(cls.collating_pipeline, data, bucket=cls.bucket)


@DATASETS.register_module()
class NaiveSVCDataset(NaiveDataset):
    """SVC training samples (reference naive.py:52-85)."""

    processing_pipeline = [
        dict(
            type="PickKeys",
            keys=[
                "path",
                "time_stretch",
                "mel",
                "contents",
                "pitches",
                "key_shift",
                "speaker",
            ],
        ),
        dict(type="Transpose", keys=[("mel", 1, 0), ("contents", 1, 0)]),
    ]

    collating_pipeline = [
        dict(type="ListToDict"),
        dict(type="PadStack", keys=[("mel", -2), ("contents", -2), ("pitches", -1)]),
        dict(
            type="ToTensor",
            keys=[
                ("time_stretch", "float32"),
                ("key_shift", "float32"),
                ("speaker", "int64"),
            ],
        ),
        dict(
            type="UnSqueeze",
            keys=[("pitches", -1), ("time_stretch", -1), ("key_shift", -1)],
        ),
    ]


@DATASETS.register_module()
class NaiveSVCPowerDataset(NaiveDataset):
    """SVC + energy conditioning (reference naive.py:88-130)."""

    processing_pipeline = [
        dict(
            type="PickKeys",
            keys=[
                "path",
                "time_stretch",
                "mel",
                "contents",
                "pitches",
                "key_shift",
                "speaker",
                "energy",
            ],
        ),
        dict(type="Transpose", keys=[("mel", 1, 0), ("contents", 1, 0)]),
    ]

    collating_pipeline = [
        dict(type="ListToDict"),
        dict(
            type="PadStack",
            keys=[("mel", -2), ("contents", -2), ("pitches", -1), ("energy", -1)],
        ),
        dict(
            type="ToTensor",
            keys=[
                ("time_stretch", "float32"),
                ("key_shift", "float32"),
                ("speaker", "int64"),
            ],
        ),
        dict(
            type="UnSqueeze",
            keys=[
                ("pitches", -1),
                ("time_stretch", -1),
                ("key_shift", -1),
                ("energy", -1),
            ],
        ),
    ]


@DATASETS.register_module()
class NaiveSVSDataset(NaiveDataset):
    """SVS with phoneme->frame map (reference naive.py:209-248)."""

    processing_pipeline = [
        dict(
            type="PickKeys",
            keys=[
                "path",
                "time_stretch",
                "mel",
                "contents",
                "pitches",
                "key_shift",
                "speaker",
                "phones2mel",
            ],
        ),
        dict(type="Transpose", keys=[("mel", 1, 0), ("contents", 1, 0)]),
    ]

    collating_pipeline = [
        dict(type="ListToDict"),
        dict(
            type="PadStack",
            keys=[("mel", -2), ("contents", -2), ("pitches", -1), ("phones2mel", -1)],
        ),
        dict(
            type="ToTensor",
            keys=[
                ("time_stretch", "float32"),
                ("key_shift", "float32"),
                ("speaker", "int64"),
            ],
        ),
        dict(
            type="UnSqueeze",
            keys=[("pitches", -1), ("time_stretch", -1), ("key_shift", -1)],
        ),
    ]


@DATASETS.register_module()
class NaiveTTSDataset(NaiveDataset):
    """TTS: token contents + mel (reference naive.py:251-280)."""

    processing_pipeline = [
        dict(type="PickKeys", keys=["path", "mel", "contents", "speaker"]),
        dict(type="Transpose", keys=[("mel", 1, 0)]),
    ]

    collating_pipeline = [
        dict(type="FilterByLength", key="mel", dim=0, min_length=1, max_length=2048),
        dict(type="ListToDict"),
        dict(type="PadStack", keys=[("mel", -2), ("contents", -1)]),
        dict(type="ToTensor", keys=[("speaker", "int64"), ("contents", "int64")]),
    ]


@DATASETS.register_module()
class NaiveDenoiserDataset(NaiveDataset):
    """Denoiser training pairs (reference naive.py:283-305)."""

    processing_pipeline = [
        dict(type="PickKeys", keys=["path", "mel", "contents"]),
        dict(type="Transpose", keys=[("mel", 1, 0), ("contents", 1, 0)]),
    ]

    collating_pipeline = [
        dict(type="ListToDict"),
        dict(type="PadStack", keys=[("mel", -2), ("contents", -2)]),
    ]


@DATASETS.register_module()
class NaiveVOCODERDataset(NaiveDataset):
    """Vocoder training: raw audio + f0 with on-the-fly pitch/loudness
    augmentation and random segment crop (reference naive.py:133-206).

    The pitch-shift resampling uses linear interpolation (scipy-free, no
    torchaudio); segment crops are fixed-size so batches are static-shape.
    """

    processing_pipeline = [
        dict(type="PickKeys", keys=["path", "audio", "pitches", "sampling_rate"]),
    ]

    collating_pipeline = [
        dict(type="ListToDict"),
        dict(type="PadStack", keys=[("audio", -1), ("pitches", -1)]),
    ]

    def __init__(
        self,
        path="dataset",
        segment_size: Optional[int] = 16384,
        hop_length: int = 512,
        sampling_rate: int = 44100,
        pitch_shift: Optional[list] = None,
        loudness_shift: Optional[list] = None,
    ):
        super().__init__(path)
        self.segment_length = segment_size
        self.hop_length = hop_length
        self.sampling_rate = sampling_rate
        self.pitch_shift = pitch_shift
        self.loudness_shift = loudness_shift

    def __getitem__(self, idx):
        x = super().__getitem__(idx)
        if x is None:
            return None
        assert x["sampling_rate"] == self.sampling_rate

        y = np.asarray(x["audio"], np.float32)
        pitches = np.asarray(x["pitches"], np.float32)

        if self.pitch_shift is not None:
            shift = (
                np.random.random() * (self.pitch_shift[1] - self.pitch_shift[0])
                + self.pitch_shift[0]
            )
            duration_shift = 2 ** (shift / 12)
            orig_sr = round(self.sampling_rate * duration_shift)
            orig_sr = orig_sr - (orig_sr % 100)

            # resample by linear interpolation orig_sr -> sampling_rate
            new_len = int(round(len(y) * self.sampling_rate / orig_sr))
            y = np.interp(
                np.linspace(0, len(y) - 1, new_len), np.arange(len(y)), y
            ).astype(np.float32)
            pitches = pitches * 2 ** (shift / 12)

        pitches = np.interp(
            np.linspace(0, 1, y.shape[-1]), np.linspace(0, 1, len(pitches)), pitches
        ).astype(np.float32)

        if self.segment_length is not None:
            if y.shape[-1] > self.segment_length:
                start = np.random.randint(0, y.shape[-1] - self.segment_length + 1)
                y = y[start : start + self.segment_length]
                pitches = pitches[start : start + self.segment_length]
            elif y.shape[-1] < self.segment_length:
                pad = self.segment_length - y.shape[-1]
                y = np.pad(y, (0, pad))
                pitches = np.pad(pitches, (0, pad))

        if self.loudness_shift is not None:
            new_amplitude = (
                np.random.random() * (self.loudness_shift[1] - self.loudness_shift[0])
                + self.loudness_shift[0]
            )
            max_amplitude = np.max(np.abs(y))
            y = y / (max_amplitude + 1e-8) * new_amplitude

        return {"audio": y[None], "pitches": pitches[None]}
