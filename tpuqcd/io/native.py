"""ctypes loader for the native gauge-ingest kernel (native/ildg_layout.cpp).

Builds the shared library on first use (g++ -O3), caches it next to the
source, and falls back to the pure-Python path transparently if no
compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _src_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    d = _src_dir()
    src = os.path.join(d, "ildg_layout.cpp")
    so = os.path.join(d, "libildg_layout.so")
    try:
        if (not os.path.exists(so) or
                os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", so,
                            src], check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.ildg_to_device_f32.restype = ctypes.c_int
        lib.ildg_to_device_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def ildg_payload_to_packed(payload: bytes, lat,
                           antiperiodic_t: bool = True):
    """ILDG binary payload -> packed gauge numpy array
    [4, 2, 3, 3, 2, T, Z, S] float32, or None if the native kernel is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    T, Z, Y, X = lat.full_shape
    S = Y * (X // 2)
    out = np.empty((4, 2, 3, 3, 2, T, Z, S), dtype=np.float32)
    rc = lib.ildg_to_device_f32(
        payload, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T, Z, Y, X, int(antiperiodic_t))
    if rc != 0:
        return None
    return out
