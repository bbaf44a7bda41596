from . import crepe, energy, feature, pitch, rmvpe, tokenizers, world  # noqa: F401
from .feature import BaseFeatureExtractor, ContentVec, HubertEncoder, HubertSoft
from .energy import RMSEnergyExtractor
from .pitch import (
    AutocorrPitchExtractor,
    BasePitchExtractor,
    YinPitchExtractor,
)

__all__ = [
    "AutocorrPitchExtractor",
    "BasePitchExtractor",
    "RMSEnergyExtractor",
    "YinPitchExtractor",
]
