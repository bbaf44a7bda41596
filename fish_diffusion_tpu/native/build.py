"""Build + load the native library (g++ -O3 -shared, cached by source mtime)."""

from __future__ import annotations

import ctypes
import subprocess
import tempfile
from pathlib import Path

_SRC_DIR = Path(__file__).parent
_SOURCES = ["monotonic_align.cpp", "datapack.cpp"]
_LIB = None


def _build(out_path: Path):
    srcs = [str(_SRC_DIR / s) for s in _SOURCES]
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", str(out_path), *srcs, "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    """Compile (if stale) and load the native library."""
    global _LIB
    if _LIB is not None:
        return _LIB

    cache_dir = Path(tempfile.gettempdir()) / "fish_diffusion_tpu_native"
    cache_dir.mkdir(exist_ok=True)
    lib_path = cache_dir / "libfishnative.so"

    src_mtime = max((_SRC_DIR / s).stat().st_mtime for s in _SOURCES)
    if not lib_path.exists() or lib_path.stat().st_mtime < src_mtime:
        _build(lib_path)

    _LIB = ctypes.CDLL(str(lib_path))
    return _LIB
