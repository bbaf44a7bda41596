from . import datapack, hifisinger, naive, wrappers  # noqa: F401  (register)
from .datapack import PackedDataset, PackedReader, pack_dataset
from .loader import DataLoader, build_loader_from_config
from .utils import (
    get_datasets_from_subfolder,
    get_speaker_map_from_subfolder,
    pad_and_stack,
    transform_pipeline,
)

__all__ = [
    "DataLoader",
    "PackedDataset",
    "PackedReader",
    "pack_dataset",
    "build_loader_from_config",
    "get_datasets_from_subfolder",
    "get_speaker_map_from_subfolder",
    "pad_and_stack",
    "transform_pipeline",
]
