# Multi-speaker HuBERT-soft SVC (reference
# configs/svc_hubert_soft_multi_speakers.py): speaker subfolders map to ids.

from fish_diffusion_tpu.datasets import (
    get_datasets_from_subfolder,
    get_speaker_map_from_subfolder,
)

_base_ = ["./svc_hubert_soft.py"]

import os

_train_root, _valid_root = "dataset/train", "dataset/valid"

if os.path.isdir(_train_root):
    speaker_mapping = get_speaker_map_from_subfolder(_train_root)
    train_datasets = get_datasets_from_subfolder(
        "NaiveSVCDataset", _train_root, speaker_mapping
    )
    valid_datasets = get_datasets_from_subfolder(
        "NaiveSVCDataset", _valid_root, speaker_mapping
    )
else:  # allow config loading without the dataset present
    speaker_mapping = {}
    train_datasets = valid_datasets = []

dataset = dict(
    _delete_=True,
    train=dict(type="ConcatDataset", datasets=train_datasets),
    valid=dict(type="ConcatDataset", datasets=valid_datasets),
)

model = dict(
    speaker_encoder=dict(
        input_size=max(len(speaker_mapping), 1),
    ),
)
