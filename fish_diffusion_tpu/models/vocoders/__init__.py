from .adamos import ADaMoSGenerator, ADaMoSHiFiGANV1  # noqa: F401
from .istft_net import ISTFTNet, ISTFTNetGenerator  # noqa: F401
from .nsf_hifigan import NsfHifiGAN, NsfHifiGANGenerator, SineGen  # noqa: F401
from .refinegan import RefineGANGenerator  # noqa: F401
