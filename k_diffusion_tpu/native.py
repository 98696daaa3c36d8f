"""ctypes bindings for the native C++ data runtime (native/kdtpu_data.cpp):
parallel JPEG/PNG decode + bicubic resize/center-crop filling whole float32
batches in one call. Falls back gracefully when the library isn't built
(`make -C native`); an on-demand build is attempted once per process.
"""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _NATIVE_DIR / "libkdtpu_data.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.kdtpu_load_batch.restype = ctypes.c_int
    lib.kdtpu_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.kdtpu_load_image.restype = ctypes.c_int
    lib.kdtpu_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.kdtpu_resize_u8.restype = None
    lib.kdtpu_resize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return _LIB


def available():
    return _load() is not None


def load_batch(paths, size, n_threads=None):
    """Decodes + resizes ``paths`` into a (N, size, size, 3) float32 batch in
    [0, 1]. Returns (batch, n_failures); failed slots are zero-filled."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native data library unavailable; run `make -C native`")
    n_threads = n_threads or min(16, os.cpu_count() or 4)
    n = len(paths)
    out = np.empty((n, size, size, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    failures = lib.kdtpu_load_batch(
        arr, n, size, n_threads, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out, failures


def load_image(path, size):
    lib = _load()
    if lib is None:
        raise RuntimeError("native data library unavailable; run `make -C native`")
    out = np.empty((size, size, 3), np.float32)
    rc = lib.kdtpu_load_image(
        str(path).encode(), size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"failed to decode {path}")
    return out


def resize_u8(img, size):
    """Bicubic resize + center-crop of a uint8 HWC image -> float32 [0,1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native data library unavailable; run `make -C native`")
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((size, size, c), np.float32)
    lib.kdtpu_resize_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
