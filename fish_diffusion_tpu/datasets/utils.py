"""Dataset utilities: declarative pipeline interpreter + bucketed collation.

Capability parity with the reference ``fish_diffusion/datasets/utils.py``:
- ``transform_pipeline`` (99-148) with ops PickKeys / ListToDict / PadStack /
  ToTensor (numpy cast here) / Transpose / UnSqueeze / FilterByLength
- ``pad_and_stack`` (37-58) returning (stacked, lens, max_len) and the
  ``*_lens`` / ``*_max_len`` batch-key convention
- speaker-map helpers (61-96)

TPU addition: ``PadStack`` rounds the padded length UP to a bucket boundary
(multiple of ``bucket_frames``) so batch shapes recur and jit caches hit —
the central static-shape discipline the torch reference never needed
(SURVEY.md §7 "Static shapes").
"""

from __future__ import annotations

from copy import deepcopy
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

# Global default frame bucket. 128 frames @ hop 512 = ~1.5 s of audio;
# multiples of 128 also align the time dim to TPU lane tiling.
DEFAULT_BUCKET = 128

_DTYPE_MAP = {
    "float32": np.float32,
    "float": np.float32,
    "int64": np.int64,
    "long": np.int64,
    "int32": np.int32,
    "bool": np.bool_,
}


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def pad_and_stack(
    x: Sequence[np.ndarray], dim: int = 0, bucket: Optional[int] = None
):
    """Pad a list of arrays to a common (bucketed) length along ``dim`` and
    stack. Returns (stacked, lens, padded_len)."""
    x = [np.asarray(i) for i in x]
    if x[0].dtype == np.float64:
        x = [i.astype(np.float32) for i in x]

    lens = np.asarray([i.shape[dim] for i in x], np.int64)
    max_len = int(lens.max())
    if bucket:
        max_len = _round_up(max_len, bucket)

    # single-copy collation: slice-assign into one preallocated output
    # (np.pad-then-stack would copy every sample twice)
    axis = dim if dim >= 0 else x[0].ndim + dim
    out_shape = list(x[0].shape)
    out_shape[axis] = max_len
    out = np.zeros((len(x), *out_shape), x[0].dtype)
    sl = [slice(None)] * x[0].ndim
    for i, arr in enumerate(x):
        sl[axis] = slice(0, arr.shape[axis])
        out[i][tuple(sl)] = arr

    return out, lens, max_len


def transform_pipeline(
    pipeline: List[Dict[str, Any]], data, bucket: Optional[int] = None
):
    """Interpret a declarative processing/collating pipeline
    (reference datasets/utils.py:99-148)."""
    for step in pipeline:
        kind = step["type"]

        if kind == "PickKeys":
            new_data = {}
            for k in step["keys"]:
                if isinstance(k, (tuple, list)):
                    new_data[k[0]] = data[k[1]]
                else:
                    new_data[k] = data[k]
            data = new_data

        elif kind == "ListToDict":
            all_keys = (
                set(j for i in data for j in i.keys())
                if "keys" not in step
                else step["keys"]
            )
            data = {k: [i[k] for i in data] for k in all_keys}

        elif kind == "PadStack":
            for k, v in step["keys"]:
                stacked, lens, max_len = pad_and_stack(data[k], v, bucket=bucket)
                data[k] = stacked
                data[k + "_lens"] = lens
                data[k + "_max_len"] = max_len

        elif kind == "ToTensor":
            # numpy casting (arrays stay host-side until shard_batch)
            for k, t in step["keys"]:
                dtype = _DTYPE_MAP[t] if isinstance(t, str) else t
                data[k] = np.asarray(data[k], dtype=dtype)

        elif kind == "Transpose":
            for k, *args in step["keys"]:
                data[k] = np.swapaxes(data[k], *args)

        elif kind == "UnSqueeze":
            for k, *args in step["keys"]:
                data[k] = np.expand_dims(data[k], *args)

        elif kind == "FilterByLength":
            data = [
                i
                for i in data
                if step["min_length"]
                <= i[step["key"]].shape[step["dim"]]
                <= step["max_length"]
            ]

        else:
            raise NotImplementedError(f"Unknown transform type: {kind}")

    return data


def get_speaker_map_from_subfolder(path, existing_speaker_map=None):
    """Subfolder name -> speaker id (reference datasets/utils.py:61-74)."""
    speaker_map = {} if existing_speaker_map is None else deepcopy(existing_speaker_map)

    for speaker_path in sorted(Path(path).iterdir()):
        if not speaker_path.is_dir() or speaker_path.name.startswith("."):
            continue
        speaker_map[str(speaker_path.name)] = len(speaker_map)

    return speaker_map


def get_datasets_from_subfolder(
    type: str, path, speaker_map: Dict[str, int], **kwargs
) -> List[dict]:
    """One dataset config per speaker subfolder
    (reference datasets/utils.py:77-96)."""
    datasets = []
    for speaker_path in sorted(Path(path).iterdir()):
        if not speaker_path.is_dir() or speaker_path.name.startswith("."):
            continue
        datasets.append(
            dict(
                type=type,
                path=str(speaker_path),
                speaker_id=speaker_map[str(speaker_path.name)],
                **kwargs,
            )
        )
    return datasets


def list_files(path, extensions={".npy"}, recursive=True) -> List[Path]:
    path = Path(path)
    glob = path.rglob("*") if recursive else path.glob("*")
    return sorted(p for p in glob if p.is_file() and p.suffix in extensions)
