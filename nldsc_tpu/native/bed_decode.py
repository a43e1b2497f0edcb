"""ctypes loader for the native .bed decoder (built from bed_decode.cpp).

Falls back gracefully: :func:`available` returns False when the shared
library has not been built, and ``BedReader`` then uses the NumPy LUT path.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libbed_decode.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bed_decode_range.restype = ctypes.c_int
        lib.bed_decode_range.argtypes = [
            ctypes.c_char_p,   # path
            ctypes.c_int64,    # n_samples
            ctypes.c_int64,    # bytes_per_snp
            ctypes.c_int64,    # snp_start
            ctypes.c_int64,    # snp_count
            ctypes.c_void_p,   # out int8 buffer (snp_count * n_samples)
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_range(path: str, n_samples: int, bytes_per_snp: int,
                 start: int, count: int) -> np.ndarray:
    lib = _load()
    out = np.empty((count, n_samples), dtype=np.int8)
    rc = lib.bed_decode_range(
        path.encode(), n_samples, bytes_per_snp, start, count,
        out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise IOError(f"native bed decoder failed with code {rc} on {path}")
    return out
