"""Data loader: shuffling, fixed-size batching, background prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` workers
(``datasets/utils.py:13-34``) with a dependency-free threaded prefetcher.
TPU-specific behavior:

- ``drop_last=True`` by default for training (static batch shapes under jit)
- batch size must divide by the ``data`` mesh axis; ``build_loader_from_config``
  checks this the way the reference wraps the valid set in RepeatDataset
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from ..registry import DATASETS
from .wrappers import RepeatDataset, SampleDataset


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        collate_fn=None,
        drop_last: bool = True,
        num_workers: int = 2,
        prefetch: int = 4,
        seed: int = 42,
        persistent_workers: bool = True,  # accepted for config parity; no-op
        process_shard=None,  # (rank, world): DistributedSampler-style split
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate_fn = collate_fn or getattr(dataset, "collate_fn", None)
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        self.process_shard = process_shard

    def __len__(self):
        n = len(self.dataset)
        if self.process_shard is not None:
            n = n // self.process_shard[1]
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            # all processes share the seed -> identical permutation, then a
            # strided rank split (torch DistributedSampler semantics)
            self._rng.shuffle(indices)
        if self.process_shard is not None:
            rank, world = self.process_shard
            indices = indices[rank::world]
        n_full = len(indices) // self.batch_size
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_full)
        ]
        if not self.drop_last and len(indices) % self.batch_size:
            batches.append(indices[n_full * self.batch_size :])
        return batches

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        batches = self._batch_indices()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # native parallel path: PackedDataset fans the batch's reads across
        # a C++ pread pool (GIL released) instead of per-item python loads
        get_batch = getattr(self.dataset, "get_batch", None)

        def producer():
            try:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    if get_batch is not None:
                        samples = get_batch([int(i) for i in batch_idx])
                    else:
                        samples = [self.dataset[int(i)] for i in batch_idx]
                    batch = (
                        self.collate_fn(samples) if self.collate_fn else samples
                    )
                    out_q.put(batch)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()


def build_loader_from_config(cfg, num_devices: int = 1):
    """Build (train_loader, valid_loader) from a config
    (reference datasets/utils.py:13-34).

    Multi-host: the configured train batch size is GLOBAL; each process gets
    batch/process_count rows and a process-specific shuffle seed, so hosts
    draw disjoint sample streams (the reference delegates the equivalent
    split to Lightning's DistributedSampler).
    """
    import jax

    train_dataset = DATASETS.build(dict(cfg.dataset.train))
    train_cfg = dict(cfg.dataloader.train)
    global_bs = train_cfg.get("batch_size", 1)
    if num_devices > 1 and global_bs % num_devices:
        raise ValueError(
            f"dataloader.train.batch_size={global_bs} must be divisible by "
            f"the {num_devices}-device data-parallel mesh (each device takes "
            f"batch/num_devices rows); raise the batch size or set "
            f"trainer.devices=1"
        )
    if jax.process_count() > 1:
        global_bs = train_cfg.get("batch_size", 1)
        assert global_bs % jax.process_count() == 0, (
            f"global batch {global_bs} not divisible by "
            f"{jax.process_count()} processes"
        )
        train_cfg["batch_size"] = global_bs // jax.process_count()
        train_cfg["process_shard"] = (jax.process_index(), jax.process_count())
    train_loader = DataLoader(
        train_dataset, collate_fn=train_dataset.collate_fn, **train_cfg
    )

    valid_dataset = DATASETS.build(dict(cfg.dataset.valid))
    if num_devices > 1 and not isinstance(
        valid_dataset, (RepeatDataset, SampleDataset)
    ):
        valid_dataset = RepeatDataset(
            valid_dataset, repeat=num_devices, collate_fn=valid_dataset.collate_fn
        )

    valid_cfg = dict(cfg.dataloader.valid)
    valid_loader = DataLoader(
        valid_dataset, collate_fn=valid_dataset.collate_fn, **valid_cfg
    )

    return train_loader, valid_loader
