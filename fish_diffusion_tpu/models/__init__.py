from . import convnext, encoders, fast_speech, llama, wavenet  # noqa: F401
from . import discriminators, hifisinger, vocoders  # noqa: F401
from .diffusion import GaussianDiffusion  # noqa: F401
from .diffsinger import DiffSinger  # noqa: F401
from .grad_tts import GradTTS  # noqa: F401


def build_model(model_cfg, precision: str = None, training: bool = False):
    """Build the trainable arch from a ``model`` config dict.

    The vocoder is NOT part of the trainable module (the reference freezes it
    and uses it only for validation audio, ``diffsinger.py:212-213``); build
    it separately via ``VOCODERS.build``.

    ``precision``: "bf16-mixed" injects bf16 compute dtype into the denoiser
    and encoder configs (params stay f32) — the TPU-native reading of the
    reference trainer's precision flag (``configs/_base_/trainers/base.py:18``).

    ``training``: selects the regime-optimal dilation-shift lowering for the
    dilated denoisers (static lax.switch shifts win the train step, traced
    shifts win the forward-only sampling scan — measured on v5e,
    ``tools/ab_dilation_probe.py``). The param tree is identical either way,
    so checkpoints move freely between trainers and inference engines.
    """
    from ..registry import ARCHS

    cfg = dict(model_cfg)
    cfg.pop("vocoder", None)

    if precision and "bf16" in str(precision):
        import jax.numpy as jnp

        cfg = _inject_dtype(cfg, jnp.bfloat16)

    if training:
        cfg = _inject_static_shifts(cfg)

    return ARCHS.build(cfg)


_STATIC_SHIFT_DENOISERS = ("WaveNetDenoiser", "ConvNextDenoiser")


def _inject_static_shifts(cfg):
    """Default ``static_dilation_shifts=True`` on denoiser sub-configs that
    support it (explicit config values win)."""
    out = {}
    for k, v in cfg.items():
        if isinstance(v, dict):
            v = _inject_static_shifts(v)
            if v.get("type") in _STATIC_SHIFT_DENOISERS:
                # explicit config values win (dict merge order)
                v = {"static_dilation_shifts": True, **v}
        out[k] = v
    return out


def _inject_dtype(cfg, dtype):
    """Set compute dtype on denoiser/encoder sub-configs that accept it."""
    out = {}
    for k, v in cfg.items():
        if isinstance(v, dict):
            v = _inject_dtype(v, dtype)
            if "type" in v and ("denoiser" in k or "encoder" in k):
                v = {**v, "dtype": dtype}
        out[k] = v
    return out
