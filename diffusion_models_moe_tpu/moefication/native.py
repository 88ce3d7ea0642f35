"""ctypes bridge to the native exact balanced-assignment solver.

Builds native/balanced_assign.cpp on first use (g++, no pip deps) and exposes
`exact_balanced_assign(cost, capacity) -> labels`. Used by
`balanced_kmeans(method="exact")` — the exact counterpart of the reference's
k_means_constrained min-cost-flow assignment (reference: moefication/moe_utils.py:104).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "balanced_assign.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libbalanced_assign.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.balanced_assign.restype = ctypes.c_int
        lib.balanced_assign.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def exact_balanced_assign(cost: np.ndarray, capacity: int) -> np.ndarray:
    """cost: (N, K) float64; returns (N,) int64 labels with each cluster
    receiving at most `capacity` points (exactly N/K when capacity = N/K)."""
    lib = _load()
    cost = np.ascontiguousarray(cost, np.float64)
    n, k = cost.shape
    out = np.empty(n, np.int64)
    rc = lib.balanced_assign(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, k, capacity,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise RuntimeError(f"balanced_assign failed with code {rc}")
    return out
