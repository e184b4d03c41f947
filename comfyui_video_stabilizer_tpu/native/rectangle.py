"""ctypes bindings for the native rectangle/suppression helpers.

Builds the shared library on first use (g++ -O3 -shared) and caches it
next to the source; import fails cleanly when no toolchain exists, and
callers fall back to the numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "rectangle.cpp"
_LIB = _HERE / "librectangle.so"
_lock = threading.Lock()
_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_LIB)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.largest_rectangle.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.largest_rectangle.restype = None
        lib.greedy_min_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.greedy_min_distance.restype = ctypes.c_int64
        _lib = lib
        return _lib


def largest_axis_aligned_rectangle(binary_mask: np.ndarray) -> Tuple[int, int, int, int]:
    lib = _load()
    mask = np.ascontiguousarray(binary_mask > 0, dtype=np.uint8)
    h, w = mask.shape
    out = np.zeros(4, np.int64)
    lib.largest_rectangle(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(h), ctypes.c_int64(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return int(out[0]), int(out[1]), int(out[2]), int(out[3])


def greedy_min_distance(
    ys: np.ndarray, xs: np.ndarray, height: int, width: int,
    min_distance: float, max_corners: int,
) -> np.ndarray:
    """Score-descending greedy acceptance; returns (k, 2) xy points."""
    lib = _load()
    ys64 = np.ascontiguousarray(ys, np.int64)
    xs64 = np.ascontiguousarray(xs, np.int64)
    out = np.zeros((max_corners, 2), np.int64)
    k = lib.greedy_min_distance(
        ys64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        xs64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(ys64)), ctypes.c_int64(height), ctypes.c_int64(width),
        ctypes.c_double(min_distance), ctypes.c_int64(max_corners),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:k]
