"""ctypes bindings for the C++ native runtime (with pure-python fallbacks).

The shared library (built by ``make -C native``) provides mmap sha256 hashing
for asset verification and the peak-normalizing PCM quantizer - the
host-native surface the reference implements in Go (tools/checksum) and numba
(tools/audio/np.py).  When the library has not been built, hashlib/numpy
fallbacks keep everything functional.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "lib",
                         "libchattts_native.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.path.isfile(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.chattts_sha256_file.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.chattts_sha256_file.restype = ctypes.c_int
            lib.chattts_float_to_int16.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16)]
            lib.chattts_float_to_int16.restype = None
            _lib = lib
        except OSError:
            _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def sha256_file(path: str) -> str:
    """Hex sha256 of a file (native mmap path when available)."""
    lib = _load()
    if lib is not None:
        out = ctypes.create_string_buffer(65)
        if lib.chattts_sha256_file(path.encode(), out) == 0:
            return out.value.decode()
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def float_to_int16(audio: np.ndarray) -> np.ndarray:
    """f32 -> i16 quantizer (tools/audio/np.py:7-11 semantics).

    A fixed 32767 gain, attenuated only when the peak exceeds full scale
    (integer math: 32767*32768 // (ceil(peak)*32768)).  Quiet audio keeps
    its loudness, and because the gain is constant for in-range signals,
    independently quantized streaming chunks share the same loudness.
    """
    x = np.ascontiguousarray(audio, dtype=np.float32).reshape(-1)
    lib = _load()
    if lib is not None:
        out = np.empty(x.shape, np.int16)
        lib.chattts_float_to_int16(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(x.size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
        return out.reshape(audio.shape)
    peak = float(np.max(np.abs(x))) if x.size else 0.0
    am = (32767 * 32768) // (max(1, int(np.ceil(peak))) * 32768)
    return np.multiply(x, float(am)).astype(np.int16).reshape(audio.shape)
