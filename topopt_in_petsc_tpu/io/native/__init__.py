"""ctypes loader for the native I/O codec (vtu_codec.cpp).

Compiles on first use with the system toolchain (g++) and caches the
shared object next to the source; every entry point has a pure-Python
fallback so the package works without a compiler.
"""

from __future__ import annotations

import base64 as _b64
import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "vtu_codec.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _build_and_load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            with open(_SRC, "rb") as f:
                tag = hashlib.sha256(f.read()).hexdigest()[:16]
            so_path = os.path.join(_DIR, f"vtu_codec_{tag}.so")
            if not os.path.exists(so_path):
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", _SRC,
                        "-o", so_path + ".tmp",
                    ],
                    check=True,
                    capture_output=True,
                )
                os.replace(so_path + ".tmp", so_path)
            lib = ctypes.CDLL(so_path)
            lib.b64_encode.restype = ctypes.c_size_t
            lib.b64_encode.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ]
            lib.f64_to_f32.restype = None
            lib.f64_to_f32.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.checksum64.restype = ctypes.c_uint64
            lib.checksum64.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
            _lib = lib
        except Exception:  # noqa: BLE001 — fall back to Python paths
            _lib = None
        return _lib


def b64_encode(data: bytes) -> bytes:
    lib = _build_and_load()
    if lib is None:
        return _b64.b64encode(data)
    out = ctypes.create_string_buffer(4 * ((len(data) + 2) // 3))
    n = lib.b64_encode(data, len(data), out)
    return out.raw[:n]


def f64_to_f32(arr: np.ndarray) -> np.ndarray:
    lib = _build_and_load()
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    if lib is None:
        return arr.astype(np.float32)
    out = np.empty(arr.size, dtype=np.float32)
    lib.f64_to_f32(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        arr.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out.reshape(arr.shape)


def checksum64(data: bytes) -> int:
    lib = _build_and_load()
    if lib is None:
        import zlib

        return zlib.adler32(data)
    return int(lib.checksum64(data, len(data)))
