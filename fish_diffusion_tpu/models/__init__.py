from . import convnext, encoders, fast_speech, llama, wavenet  # noqa: F401
from . import discriminators, hifisinger, vocoders  # noqa: F401
from .diffusion import GaussianDiffusion  # noqa: F401
from .diffsinger import DiffSinger  # noqa: F401
from .grad_tts import GradTTS  # noqa: F401


def build_model(model_cfg):
    """Build the trainable arch from a ``model`` config dict.

    The vocoder is NOT part of the trainable module (the reference freezes it
    and uses it only for validation audio, ``diffsinger.py:212-213``); build
    it separately via ``VOCODERS.build``.
    """
    from ..registry import ARCHS

    cfg = dict(model_cfg)
    cfg.pop("vocoder", None)
    return ARCHS.build(cfg)
