"""Dataset wrappers (parity with reference ``fish_diffusion/datasets/
{concat,repeat,sample}.py``)."""

from __future__ import annotations

import numpy as np

from ..registry import DATASETS


@DATASETS.register_module()
class ConcatDataset:
    """Concatenate several datasets (reference concat.py:9)."""

    def __init__(self, datasets, collate_fn=None):
        self.datasets = [
            DATASETS.build(d) if isinstance(d, dict) else d for d in datasets
        ]
        self._collate = collate_fn or self.datasets[0].collate_fn
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx):
        ds_idx = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[ds_idx][idx - int(self._offsets[ds_idx])]

    @property
    def collate_fn(self):
        return self._collate


@DATASETS.register_module()
class RepeatDataset:
    """Repeat a dataset N times — used so every data-parallel shard sees the
    small validation set (reference repeat.py:9-16, utils.py:23-27)."""

    def __init__(self, dataset, repeat=1, collate_fn=None):
        self.dataset = (
            DATASETS.build(dataset) if isinstance(dataset, dict) else dataset
        )
        self.repeat = repeat
        self._collate = collate_fn or self.dataset.collate_fn

    def __len__(self):
        return len(self.dataset) * self.repeat

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]

    @property
    def collate_fn(self):
        return self._collate


@DATASETS.register_module()
class SampleDataset:
    """Random fixed-size subsample per epoch (reference sample.py:10)."""

    def __init__(self, dataset, num_samples, collate_fn=None, seed=42):
        self.dataset = (
            DATASETS.build(dataset) if isinstance(dataset, dict) else dataset
        )
        self.num_samples = num_samples
        self._collate = collate_fn or self.dataset.collate_fn
        self._rng = np.random.default_rng(seed)
        self._indices = self._rng.choice(
            len(self.dataset), size=min(num_samples, len(self.dataset)), replace=False
        )

    def resample(self):
        self._indices = self._rng.choice(
            len(self.dataset),
            size=min(self.num_samples, len(self.dataset)),
            replace=False,
        )

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, idx):
        return self.dataset[int(self._indices[idx])]

    @property
    def collate_fn(self):
        return self._collate
