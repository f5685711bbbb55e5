"""ctypes bindings for the native (C++) data loader, built on demand.

The shared library is compiled from loader.cpp with the system toolchain on
first import (cached next to the source; rebuilt when the source is newer).
Falls back cleanly: ``available()`` is False when g++ or the image libraries
are missing, and callers (scene/cameras.py) use PIL instead.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_LIB = os.path.join(_HERE, "libgsplat_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _LIB, "-ljpeg", "-lpng"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        print(f"[gsplat_tpu.native] build failed:\n{proc.stderr[:2000]}")
        return False
    return True


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.gs_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.gs_image_size.restype = ctypes.c_int
        lib.gs_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.gs_decode_image.restype = ctypes.c_int
        lib.gs_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.gs_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return (os.environ.get("GSPLAT_NATIVE_LOADER", "1") != "0"
            and _load() is not None)


def image_size(path: str):
    """(width, height) or None."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.gs_image_size(path.encode(), ctypes.byref(w),
                         ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def decode_image(path: str, out_w: int, out_h: int):
    """float32 (4, out_h, out_w) RGBA in [0,1] + has_alpha flag, or None."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty((4, out_h, out_w), np.float32)
    rc = lib.gs_decode_image(
        path.encode(), out_w, out_h,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc < 0:
        return None
    return buf, bool(rc)


def decode_batch(paths, out_w: int, out_h: int, n_threads: int = 0):
    """float32 (N, 4, out_h, out_w) + has_alpha (N,) bool, or None.

    Decodes the whole camera set across a thread pool — the startup-latency
    killer for multi-hundred-image scenes."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    buf = np.empty((n, 4, out_h, out_w), np.float32)
    flags = np.empty((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.gs_decode_batch(
        arr, n, out_w, out_h,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    if failures:
        return None
    return buf, flags.astype(bool)
