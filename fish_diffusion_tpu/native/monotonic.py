"""ctypes wrapper for the native maximum-path kernel."""

from __future__ import annotations

import ctypes

import numpy as np

from .build import load_library


def maximum_path_native(
    values: np.ndarray, t_ys: np.ndarray, t_xs: np.ndarray
) -> np.ndarray:
    """values [B, T_y, T_x] float32 -> one-hot path [B, T_y, T_x] int32.

    Host-side equivalent of ``ops.monotonic_align.maximum_path``.
    """
    values = np.ascontiguousarray(values, np.float32).copy()
    t_ys = np.ascontiguousarray(t_ys, np.int32)
    t_xs = np.ascontiguousarray(t_xs, np.int32)
    B, T_y, T_x = values.shape
    paths = np.zeros((B, T_y, T_x), np.int32)

    lib = load_library()
    lib.maximum_path(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(B),
        ctypes.c_int(T_y),
        ctypes.c_int(T_x),
    )
    return paths
