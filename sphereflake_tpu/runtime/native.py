"""ctypes bindings to the native runtime library (native/*.cpp).

The native library carries the host-side subsystems the reference
implements in C++ — Sobol sampling (Sobol.cpp), mt19937 (SSAO.cpp noise),
and the display/output path (PNG instead of a GL window). Every entry
point has a pure-Python fallback elsewhere in the package; this module
raises ImportError when the library hasn't been built
(`make -C native`), and callers degrade gracefully.
"""

from __future__ import annotations

import ctypes
import functools
import os

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libsphereflake_native.so"),
    os.path.join(os.path.dirname(__file__), "libsphereflake_native.so"),
]


@functools.lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    for path in _LIB_PATHS:
        if os.path.exists(path):
            lib = ctypes.CDLL(os.path.abspath(path))
            lib.sf_sobol_direction_numbers.restype = ctypes.c_int
            lib.sf_sobol_sample_batch.restype = ctypes.c_int
            lib.sf_png_encode_rgb8.restype = ctypes.c_int64
            return lib
    raise ImportError(
        "libsphereflake_native.so not built (run `make -C native`)"
    )


def available() -> bool:
    try:
        _lib()
        return True
    except ImportError:
        return False


def sobol_direction_numbers(dims: int) -> np.ndarray:
    out = np.zeros((dims, 52), dtype=np.uint32)
    rc = _lib().sf_sobol_direction_numbers(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), dims
    )
    if rc != 0:
        raise ValueError(f"dims={dims} exceeds native Joe-Kuo table")
    return out


def sobol_sample_batch(index_base: int, count: int, dim: int,
                       scramble: np.ndarray | None = None) -> np.ndarray:
    out = np.zeros(count, dtype=np.float64)
    scr = None
    if scramble is not None:
        scramble = np.ascontiguousarray(scramble, dtype=np.uint32)
        assert scramble.shape == (count,)
        scr = scramble.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    rc = _lib().sf_sobol_sample_batch(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_uint64(index_base), ctypes.c_uint64(count), dim, scr,
    )
    if rc != 0:
        raise ValueError(f"bad dim {dim}")
    return out


def mt19937_draw(seed: int, count: int, skip: int = 0) -> np.ndarray:
    out = np.zeros(count, dtype=np.uint32)
    _lib().sf_mt19937_draw(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_uint32(seed), ctypes.c_uint64(skip), ctypes.c_uint64(count),
    )
    return out


def encode_png_native(rgb: np.ndarray) -> bytes:
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, c = rgb.shape
    assert c == 3
    lib = _lib()
    size = lib.sf_png_encode_rgb8(
        None, 0, rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h
    )
    buf = (ctypes.c_uint8 * size)()
    n = lib.sf_png_encode_rgb8(
        buf, size, rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h
    )
    assert n == size
    return bytes(buf)
