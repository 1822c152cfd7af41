"""Native (C++) host-side preprocessing engine, loaded via ctypes.

Compiled lazily with g++ on first use (``-O3``, pthreads) and
cached next to the source. Falls back cleanly to the pure-Python path when
no compiler is available — ``available()`` reports which path is active.

This is the framework's native host-runtime component: the GIL-free
multithreaded batch resize replaces what the reference delegates to
DataLoader worker *processes* (reference configs/config.py:29).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "preprocess.cpp"
_LIB = Path(__file__).parent / "_preprocess.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

DEFAULT_THREADS = min(8, os.cpu_count() or 1)


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           str(_SRC), "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        lib.resize_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64]
        lib.resize_batch_u8.restype = None
        lib.normalize_batch_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64]
        lib.normalize_batch_u8.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    """True when the compiled native engine is loadable."""
    return _load() is not None


def resize_batch(images, size: int,
                 n_threads: int = DEFAULT_THREADS) -> np.ndarray:
    """Resize a list of HxWx3 uint8 arrays to ``(N, size, size, 3)`` with
    the native threaded engine. Raises RuntimeError if unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocess engine unavailable")
    n = len(images)
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    out = np.empty((n, size, size, 3), dtype=np.uint8)
    ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in images])
    hw = np.empty(2 * n, dtype=np.int64)
    for i, im in enumerate(images):
        hw[2 * i], hw[2 * i + 1] = im.shape[0], im.shape[1]
    lib.resize_batch_u8(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, out.ctypes.data_as(ctypes.c_void_p), size, size, n_threads)
    return out


def normalize_batch(images_u8: np.ndarray, mean, std,
                    n_threads: int = DEFAULT_THREADS) -> np.ndarray:
    """uint8 (N, H, W, 3) -> float32 ImageNet-normalized, natively."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocess engine unavailable")
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    n = images_u8.shape[0]
    hw = int(np.prod(images_u8.shape[1:-1]))
    out = np.empty(images_u8.shape, dtype=np.float32)
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    inv_std = np.ascontiguousarray(1.0 / np.asarray(std, np.float32))
    lib.normalize_batch_u8(
        images_u8.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        n, hw, mean.ctypes.data_as(ctypes.c_void_p),
        inv_std.ctypes.data_as(ctypes.c_void_p), n_threads)
    return out
