"""ctypes loader for the native host kernels (native/uwcv_native.cpp).

Builds the shared library on first use when a compiler is present (the image
ships g++); callers treat ``lib() is None`` as "use the numpy fallback".
The build is cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "uwcv_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libuwcv_native.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SRC):
            return None
        so = _build()
        if so is None:
            return None
        try:
            l = ctypes.CDLL(so)
            l.rle_encode_f.restype = ctypes.c_int64
            l.rle_encode_f.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64]
            l.label_components.restype = ctypes.c_int32
            l.label_components.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p]
            l.moore_trace.restype = ctypes.c_int64
            l.moore_trace.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64]
            _LIB = l
        except OSError:
            _LIB = None
        return _LIB


def rle_encode_fortran(mask: np.ndarray) -> Optional[List[int]]:
    """Native Fortran-order RLE; None if the library is unavailable."""
    l = lib()
    if l is None:
        return None
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = m.shape
    cap = (m.size // 2) + 2
    out = np.empty(cap * 2, np.int64)
    n = l.rle_encode_f(m.ctypes.data, h, w, out.ctypes.data, cap)
    if n < 0:
        return None
    return out[: n * 2].tolist()


def label_components(mask: np.ndarray) -> Optional[Tuple[np.ndarray, int]]:
    l = lib()
    if l is None:
        return None
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = m.shape
    labels = np.zeros((h, w), np.int32)
    n = l.label_components(m.ctypes.data, h, w, labels.ctypes.data)
    return labels, int(n)


def moore_trace(labels: np.ndarray, comp: int) -> Optional[np.ndarray]:
    l = lib()
    if l is None:
        return None
    lab = np.ascontiguousarray(labels, dtype=np.int32)
    h, w = lab.shape
    cap = 4 * (h + w) + 16
    while True:
        out = np.empty(cap * 2, np.int32)
        n = l.moore_trace(lab.ctypes.data, h, w, comp, out.ctypes.data, cap)
        if n >= 0:
            return out[: n * 2].reshape(-1, 2).astype(np.float64)
        cap *= 4
        if cap > 8 * h * w:
            return None
