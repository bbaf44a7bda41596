from .nsf_hifigan import NsfHifiGAN, NsfHifiGANGenerator, SineGen  # noqa: F401
