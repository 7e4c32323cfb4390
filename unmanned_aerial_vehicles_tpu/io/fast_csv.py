"""ctypes binding for the native CSV parser (with NumPy fallback).

The shared library is built lazily from ``native/csv_loader.cpp`` on first
use (g++ is assumed present on dev machines; any failure falls back to
``numpy.genfromtxt``, so the framework never hard-depends on the toolchain).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "csv_loader.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libuavcsv.so")

_lib = None
_lib_failed = False


def _get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.uav_parse_csv.restype = ctypes.c_long
        lib.uav_parse_csv.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.uav_count_rows.restype = ctypes.c_long
        lib.uav_count_rows.argtypes = [ctypes.c_char_p, ctypes.c_int]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_numeric_csv(path: str, n_cols: int, skip_header: int = 1) -> np.ndarray:
    """Parse an all-numeric CSV into ``(rows, n_cols)`` float64.

    Native single-pass parser when available; ``numpy.genfromtxt`` fallback.
    """
    lib = _get_lib()
    if lib is not None:
        pathb = path.encode()
        n_rows = lib.uav_count_rows(pathb, skip_header)
        if n_rows > 0:
            out = np.empty((n_rows, n_cols), np.float64)
            got = lib.uav_parse_csv(
                pathb,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                n_rows,
                n_cols,
                skip_header,
            )
            if got >= 0:
                return out[:got]
        # fall through to numpy on any native error
    data = np.genfromtxt(path, delimiter=",", skip_header=skip_header,
                         dtype=np.float64)
    return np.atleast_2d(data)
