"""ctypes loader for the native host runtime (cmdiad_native.cc).

Builds the shared library with g++ on first use if no prebuilt .so is found
(this image has no pybind11; the C ABI + ctypes keeps the binding
dependency-free).  All callers fall back to the pure-Python implementations
when the toolchain is unavailable, so the native layer is an accelerator,
never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cmdiad_native.cc")
_SO = os.path.join(_HERE, "libcmdiad_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on demand; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _load_failed = True
            return None
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_f64p = ctypes.POINTER(ctypes.c_double)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        lib.tiff_probe_f32.argtypes = [c_u8p, ctypes.c_int64, c_i64p, c_i64p, c_i64p]
        lib.tiff_probe_f32.restype = ctypes.c_int
        lib.tiff_decode_f32.argtypes = [c_u8p, ctypes.c_int64, c_f32p, ctypes.c_int64]
        lib.tiff_decode_f32.restype = ctypes.c_int
        lib.nearest_resize_f32.argtypes = [c_f32p] + [ctypes.c_int64] * 3 + [c_f32p] + [ctypes.c_int64] * 2
        lib.nearest_resize_f32.restype = None
        lib.ransac_plane.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_double,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_uint64, c_f64p]
        lib.ransac_plane.restype = None
        lib.dbscan.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_double,
                               ctypes.c_int64, c_i32p]
        lib.dbscan.restype = None
        _lib = lib
        return _lib


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def tiff_decode(data: bytes) -> Optional[np.ndarray]:
    """Decode an uncompressed LE TIFF to float32 (H, W, C); None -> fallback."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    c = ctypes.c_int64()
    rc = lib.tiff_probe_f32(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                            len(data), ctypes.byref(h), ctypes.byref(w),
                            ctypes.byref(c))
    if rc != 0:
        return None
    out = np.empty((h.value, w.value, c.value), np.float32)
    rc = lib.tiff_decode_f32(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        _fptr(out), out.size)
    if rc != 0:
        return None
    return out[:, :, 0] if c.value == 1 else out


def nearest_resize(src: np.ndarray, oh: int, ow: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None or src.dtype != np.float32 or src.ndim != 3:
        return None
    src = np.ascontiguousarray(src)
    dst = np.empty((oh, ow, src.shape[2]), np.float32)
    lib.nearest_resize_f32(_fptr(src), src.shape[0], src.shape[1],
                           src.shape[2], _fptr(dst), oh, ow)
    return dst


def ransac_plane(points: np.ndarray, dist_threshold: float = 0.004,
                 ransac_n: int = 50, iterations: int = 1000,
                 seed: int = 0) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(4, np.float64)
    lib.ransac_plane(_fptr(pts), len(pts), dist_threshold, ransac_n,
                     iterations, seed,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def dbscan(points: np.ndarray, eps: float = 0.006,
           min_points: int = 30) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    labels = np.empty(len(pts), np.int32)
    lib.dbscan(_fptr(pts), len(pts), eps, min_points,
               labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return labels
