"""Native (C++) host kernels, loaded via ctypes.

The compute path of the framework is JAX/XLA/Pallas; these kernels serve
host-side preprocessing where accelerator dispatch is pure overhead
(SURVEY.md §2.1 flags monotonic_align as the reference's one compiled
component).
"""

from .build import load_library
from .monotonic import maximum_path_native

__all__ = ["load_library", "maximum_path_native"]
