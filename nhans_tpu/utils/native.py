"""ctypes binding for the native host runtime (native/nhans_native.cpp).

Build with ``make -C native`` (or call :func:`ensure_built`).  Falls back
cleanly: callers should check :func:`available` and use the numpy/scipy
path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnhans_native.so")

_lib: Optional[ctypes.CDLL] = None


def ensure_built(quiet: bool = True) -> bool:
    """Compile the native library if needed.  Returns availability."""
    if os.path.exists(_LIB_PATH):
        return True
    if not os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True,
                       capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not ensure_built():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.nhans_read_wav.restype = ctypes.c_int64
    lib.nhans_read_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
    lib.nhans_load_batch.restype = ctypes.c_int32
    lib.nhans_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float)]
    lib.nhans_load_batch_i16.restype = ctypes.c_int32
    lib.nhans_load_batch_i16.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_wav(path: str, max_samples: int,
             expect_rate: int = 16000) -> Tuple[np.ndarray, int, float]:
    """Decode one wav into a float32 array (int16 scale).  Also returns
    the WHOLE-file peak (scanned past the buffer cap).  Raises on error
    codes mirroring the strict reader's asserts."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.zeros(max_samples, np.float32)
    peak = ctypes.c_float(0.0)
    n = lib.nhans_read_wav(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, expect_rate, ctypes.byref(peak))
    if n < 0:
        raise ValueError(f"{path}: native wav decode error {n}")
    return out, int(n), float(peak.value)


def load_batch(paths: List[str], max_samples: int,
               expect_rate: int = 16000,
               num_threads: int = 8
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a batch of wavs into a zeroed [n, max_samples] buffer with
    per-file lengths and whole-file peaks, using the native thread pool."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    out = np.zeros((n, max_samples), np.float32)
    lens = np.zeros(n, np.int64)
    peaks = np.zeros(n, np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed = lib.nhans_load_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        expect_rate, num_threads,
        peaks.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if failed:
        bad = [paths[i] for i in range(n) if lens[i] < 0]
        raise ValueError(f"native batch decode: {failed} failures: {bad[:3]}")
    return out, lens.astype(np.int32), peaks


def load_batch_i16(paths: List[str], max_samples: int,
                   expect_rate: int = 16000,
                   num_threads: int = 8
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a batch of wavs straight into a zeroed int16 [n, max_samples]
    buffer (the train pipeline's wire format) with lengths and whole-file
    peaks — no float32 intermediate, no GIL-bound numpy conversion."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    out = np.zeros((n, max_samples), np.int16)
    lens = np.zeros(n, np.int64)
    peaks = np.zeros(n, np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed = lib.nhans_load_batch_i16(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        max_samples, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        expect_rate, num_threads,
        peaks.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if failed:
        bad = [paths[i] for i in range(n) if lens[i] < 0]
        raise ValueError(f"native batch decode: {failed} failures: {bad[:3]}")
    return out, lens.astype(np.int32), peaks
