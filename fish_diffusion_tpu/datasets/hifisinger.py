"""HiFiSinger GAN-training dataset (parity with reference
``fish_diffusion/datasets/hifisinger.py``): raw audio + aligned random
audio/mel-frame crops; fixed ``segment_size`` keeps batches static-shape.

Also ``AudioFolderDataset``: raw wav folders without preprocessing artifacts
(covers the reference's ``configs/_base_/datasets/audio_folder.py`` entry,
whose dataset class the reference never shipped).
"""

from __future__ import annotations

import numpy as np

from ..registry import DATASETS
from .naive import NaiveDataset
from .utils import list_files


@DATASETS.register_module()
class HiFiSVCDataset(NaiveDataset):
    processing_pipeline = [
        dict(
            type="PickKeys",
            keys=[
                "path",
                "time_stretch",
                "audio",
                "contents",
                "pitches",
                "key_shift",
                "speaker",
            ],
        ),
        dict(type="UnSqueeze", keys=[("audio", 0)]),
        dict(type="Transpose", keys=[("contents", 1, 0)]),
    ]

    collating_pipeline = [
        dict(type="ListToDict"),
        dict(
            type="PadStack",
            keys=[("audio", -1), ("contents", -2), ("pitches", -1)],
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

    def __init__(self, path="dataset", speaker_id=0, segment_size=-1, hop_length=512):
        super().__init__(path, speaker_id)
        self.segment_size = segment_size
        self.hop_length = hop_length

    def __getitem__(self, idx):
        x = super().__getitem__(idx)
        if x is None:
            return None

        if (
            self.segment_size is not None
            and self.segment_size > 0
        ):
            n_frames = self.segment_size // self.hop_length
            if (
                x["contents"].shape[1] > n_frames
                and x["audio"].shape[1] > self.segment_size
            ):
                start = np.random.randint(
                    0, x["audio"].shape[1] - self.segment_size + 1
                )
                # align the crop to a hop boundary so frames match samples
                start = (start // self.hop_length) * self.hop_length
                f_start = start // self.hop_length
                x["audio"] = x["audio"][:, start : start + self.segment_size]
                x["pitches"] = x["pitches"][f_start : f_start + n_frames]
                x["contents"] = x["contents"][:, f_start : f_start + n_frames]

        return x


@DATASETS.register_module()
class AudioFolderDataset:
    """Raw wav folder -> (audio, sampling_rate, speaker) samples."""

    def __init__(self, path="dataset", speaker_id=0):
        self.paths = list_files(path, {".wav"}, recursive=True)
        self.speaker_id = speaker_id
        assert len(self.paths) > 0, f"No wav files found in {path}"

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        from ..utils.audio import load_wav

        try:
            audio, sr = load_wav(self.paths[idx])
        except Exception:
            print(f"Error when loading {self.paths[idx]}, skipping...")
            return None
        return {
            "path": str(self.paths[idx]),
            "audio": audio[None],
            "sampling_rate": sr,
            "speaker": self.speaker_id,
        }

    @classmethod
    def collate_fn(cls, data):
        from .utils import transform_pipeline

        data = [x for x in data if x is not None]
        return transform_pipeline(
            [
                dict(type="ListToDict"),
                dict(type="PadStack", keys=[("audio", -1)]),
                dict(type="ToTensor", keys=[("speaker", "int64")]),
            ],
            data,
        )
