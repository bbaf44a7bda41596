"""fish_diffusion_tpu — a TPU-native (JAX/XLA/Pallas/pjit) singing-voice
conversion / synthesis / TTS framework with the capabilities of
fishaudio/fish-diffusion, re-designed for TPU hardware.

Layer map (mirrors reference SURVEY.md §1, built TPU-first):

- ``ops``       — numeric/DSP kernels (STFT/mel, pitch transforms, schedules)
- ``config``    — pytree configs with ``_base_`` inheritance + registries
- ``models``    — denoisers, condition encoders, diffusion, vocoders (flax)
- ``parallel``  — device mesh + sharding rules (GSPMD/pjit), no hand-written comm
- ``training``  — jitted train steps, optimizers, EMA, checkpointing
- ``datasets``  — npy-dict datasets with bucketed static-shape collation
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even where a device plugin presets jax_platforms at
# import time (the axon TPU plugin overrides the env var). Harmless when the
# env var is unset or jax is already initialized.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
