from .audio import save_wav, slice_audio
from .viz import plot_mel, viz_synth_sample

__all__ = ["save_wav", "slice_audio", "plot_mel", "viz_synth_sample"]
