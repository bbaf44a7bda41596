"""Packed dataset format (.fpk) + native parallel reader.

The reference trains from one pickled ``.npy`` dict per sample and relies on
``torch.utils.data.DataLoader`` worker processes (native code under torch)
to hide IO latency. This module is the TPU framework's equivalent IO
runtime:

- ``pack_dataset`` converts a directory of preprocessing artifacts into ONE
  ``.fpk`` file: fixed header, per-sample offset table, contiguous raw array
  blobs, and a JSON metadata footer (shapes/dtypes/scalar extras). No pickle
  on the read path.
- ``PackedReader`` wraps the C++ reader (``native/datapack.cpp``): batch
  reads fan out across a pread thread pool with the GIL released.
- ``PackedDataset`` is a drop-in for the ``Naive*Dataset`` family: point it
  at a ``.fpk`` and name the variant whose processing/collating pipelines to
  apply (``variant="NaiveSVCDataset"`` by default).

Layout notes: arrays inside one sample are 64-byte aligned and samples are
stored contiguously in index order, so a shuffled epoch still issues few,
large, mostly-forward reads.
"""

from __future__ import annotations

import ctypes
import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..registry import DATASETS
from .utils import transform_pipeline

_MAGIC = b"FPK1"
_VERSION = 1
_ALIGN = 64


def _align(n: int) -> int:
    return (n + _ALIGN - 1) // _ALIGN * _ALIGN


def pack_samples(samples, out_path) -> int:
    """Write an iterable of dict samples to ``out_path``. Returns count.

    Array values become raw blobs; scalars/strings go to the JSON footer.
    """
    out_path = Path(out_path)
    metas: List[dict] = []
    table: List[tuple] = []

    with open(out_path, "wb") as f:
        f.write(b"\0" * 32)  # header placeholder
        # table placeholder comes after we know n; write blobs to a temp
        # region by buffering offsets relative to blob start, fix later
        blob_chunks: List[bytes] = []
        blob_pos = 0
        for sample in samples:
            keys_meta = {}
            extras = {}
            sample_start = blob_pos
            chunks: List[bytes] = []
            for key in sorted(sample.keys()):
                value = sample[key]
                if isinstance(value, np.ndarray):
                    raw = np.ascontiguousarray(value).tobytes()
                    rel = blob_pos - sample_start
                    keys_meta[key] = dict(
                        dtype=str(value.dtype),
                        shape=list(value.shape),
                        offset=rel,
                        nbytes=len(raw),
                    )
                    chunks.append(raw)
                    blob_pos += len(raw)
                    pad = _align(blob_pos) - blob_pos
                    if pad:
                        chunks.append(b"\0" * pad)
                        blob_pos += pad
                else:
                    extras[key] = value
            size = blob_pos - sample_start
            blob_chunks.append(b"".join(chunks))
            table.append((sample_start, size))
            metas.append(dict(keys=keys_meta, extras=extras))
            blob_pos = _align(blob_pos)
            tail = blob_pos - (sample_start + size)
            if tail:
                blob_chunks[-1] += b"\0" * tail

        n = len(table)
        table_bytes = n * 16
        blob_base = _align(32 + table_bytes)

        # table with absolute offsets
        tbl = np.zeros((n, 2), dtype="<u8")
        for i, (off, size) in enumerate(table):
            tbl[i, 0] = blob_base + off
            tbl[i, 1] = size
        f.write(tbl.tobytes())
        f.write(b"\0" * (blob_base - 32 - table_bytes))
        for chunk in blob_chunks:
            f.write(chunk)
        json_offset = f.tell()
        json_bytes = json.dumps({"samples": metas}).encode()
        f.write(json_bytes)

        f.seek(0)
        header = (
            _MAGIC
            + np.uint32(_VERSION).tobytes()
            + np.uint64(n).tobytes()
            + np.uint64(json_offset).tobytes()
            + np.uint64(len(json_bytes)).tobytes()
        )
        f.write(header)
    return n


def pack_dataset(src_dir, out_path, pattern: str = "*.npy") -> int:
    """Pack a directory of pickled-dict ``.npy`` preprocessing artifacts."""
    src_dir = Path(src_dir)
    paths = sorted(src_dir.rglob(pattern))
    assert paths, f"no {pattern} files under {src_dir}"

    def gen():
        for p in paths:
            x = np.load(p, allow_pickle=True).item()
            x.setdefault("path", str(p))
            yield x

    return pack_samples(gen(), out_path)


class PackedReader:
    """ctypes wrapper over the native .fpk reader."""

    def __init__(self, path):
        from ..native.build import load_library

        self._lib = load_library()
        self._lib.fpk_open.restype = ctypes.c_void_p
        self._lib.fpk_open.argtypes = [ctypes.c_char_p]
        self._lib.fpk_json.restype = ctypes.c_char_p
        self._lib.fpk_json.argtypes = [ctypes.c_void_p]
        self._lib.fpk_num_samples.restype = ctypes.c_int64
        self._lib.fpk_num_samples.argtypes = [ctypes.c_void_p]
        self._lib.fpk_sample_size.restype = ctypes.c_int64
        self._lib.fpk_sample_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        self._lib.fpk_read.restype = ctypes.c_int
        self._lib.fpk_read.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        self._lib.fpk_read_batch.restype = ctypes.c_int
        self._lib.fpk_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int32,
        ]
        self._lib.fpk_close.argtypes = [ctypes.c_void_p]

        self._h = self._lib.fpk_open(str(path).encode())
        if not self._h:
            raise OSError(f"cannot open fpk file: {path}")
        self.meta = json.loads(self._lib.fpk_json(self._h).decode())["samples"]
        self.n = int(self._lib.fpk_num_samples(self._h))

    def __len__(self):
        return self.n

    def _decode(self, idx: int, buf: np.ndarray) -> Dict[str, object]:
        meta = self.meta[idx]
        out: Dict[str, object] = dict(meta.get("extras", {}))
        for key, km in meta["keys"].items():
            a = np.frombuffer(
                buf, dtype=np.dtype(km["dtype"]),
                count=int(np.prod(km["shape"], dtype=np.int64)) if km["shape"] else 1,
                offset=km["offset"],
            )
            out[key] = a.reshape(km["shape"])
        return out

    def read(self, idx: int) -> Dict[str, object]:
        size = self._lib.fpk_sample_size(self._h, idx)
        if size < 0:
            raise IndexError(idx)
        buf = np.empty(size, np.uint8)
        rc = self._lib.fpk_read(self._h, idx, ctypes.c_void_p(buf.ctypes.data))
        if rc != 0:
            raise OSError(f"fpk_read({idx}) failed: {rc}")
        return self._decode(idx, buf)

    def read_batch(
        self, indices, threads: int = 8
    ) -> List[Dict[str, object]]:
        n = len(indices)
        idx_arr = np.asarray(indices, np.int64)
        bufs = [
            np.empty(int(self._lib.fpk_sample_size(self._h, int(i))), np.uint8)
            for i in idx_arr
        ]
        ptrs = (ctypes.c_void_p * n)(*[b.ctypes.data for b in bufs])
        rc = self._lib.fpk_read_batch(
            self._h,
            idx_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            ptrs,
            threads,
        )
        if rc != 0:
            raise OSError(f"fpk_read_batch failed: {rc}")
        return [self._decode(int(i), b) for i, b in zip(idx_arr, bufs)]

    def close(self):
        if self._h:
            self._lib.fpk_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


@DATASETS.register_module()
class PackedDataset:
    """Naive*Dataset drop-in over one .fpk file.

    ``variant`` names the registered dataset class whose pipelines apply
    (processing per sample, collating per batch). The loader detects
    ``get_batch`` and uses the parallel native read path.
    """

    def __init__(
        self,
        path: str,
        speaker_id: int = 0,
        variant: str = "NaiveSVCDataset",
        io_threads: int = 8,
    ):
        self.reader = PackedReader(path)
        self.speaker_id = speaker_id
        self.io_threads = io_threads
        self._variant = DATASETS.get(variant)
        self.collate_fn = self._variant.collate_fn

    def __len__(self):
        return len(self.reader)

    def _process(self, x: Dict[str, object]):
        x["speaker"] = self.speaker_id
        return transform_pipeline(self._variant.processing_pipeline, x)

    def __getitem__(self, idx: int):
        try:
            return self._process(self.reader.read(int(idx)))
        except Exception:
            print(f"Error when loading packed sample {idx}, skipping...")
            return None

    def get_batch(self, indices) -> List:
        samples = self.reader.read_batch(indices, threads=self.io_threads)
        return [self._process(x) for x in samples]
