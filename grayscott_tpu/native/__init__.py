"""Native (C++) host-pipeline components, loaded via ctypes.

The reference's host-side hot paths are native Rust (rayon colorize split,
data-to-pics/src/main.rs:126-144). Here the equivalent lives in C++
(colorize.cpp), compiled on first use with the toolchain baked into the
image and cached next to the source. Everything degrades gracefully to the
NumPy implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "colorize.cpp")
_LIB_PATH = os.path.join(_DIR, "_gs_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load():
    """The native library handle, building it on first use; None if
    unavailable (callers fall back to NumPy)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        fresh = os.path.exists(_LIB_PATH) and os.path.getmtime(
            _LIB_PATH
        ) >= os.path.getmtime(_SRC)
        if not fresh and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.gs_colorize.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_float,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ]
            lib.gs_colorize.restype = None
            lib.gs_native_abi_version.restype = ctypes.c_int
            if lib.gs_native_abi_version() != 1:
                return None
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def colorize(values: np.ndarray, lut: np.ndarray, scale: float,
             num_threads: int | None = None) -> np.ndarray | None:
    """Native colorize; returns None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    v = np.ascontiguousarray(values, dtype=np.float32)
    lut8 = np.ascontiguousarray(lut, dtype=np.uint8)
    out = np.empty(v.shape + (3,), dtype=np.uint8)
    if num_threads is None:
        num_threads = min(os.cpu_count() or 1, 8)
    lib.gs_colorize(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_size_t(v.size),
        lut8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_float(scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(num_threads),
    )
    return out
