from .mel import (
    LogMelSpectrogram,
    dynamic_range_compression,
    dynamic_range_decompression,
    mel_filter_bank,
    stft_magnitude,
)
from .pitch import (
    pitch_to_coarse,
    pitch_to_log,
    pitch_to_log_quant,
    pitch_to_mel_scale,
    pitch_to_scale,
    pitch_quant,
)
from .schedule import get_noise_schedule_list
from .masking import get_mask_from_lengths
from .tensor import interpolate, repeat_expand

__all__ = [
    "LogMelSpectrogram",
    "dynamic_range_compression",
    "dynamic_range_decompression",
    "mel_filter_bank",
    "stft_magnitude",
    "pitch_to_coarse",
    "pitch_to_log",
    "pitch_to_log_quant",
    "pitch_to_mel_scale",
    "pitch_to_scale",
    "pitch_quant",
    "get_noise_schedule_list",
    "get_mask_from_lengths",
    "interpolate",
    "repeat_expand",
]
