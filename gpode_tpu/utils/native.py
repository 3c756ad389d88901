"""ctypes bindings to the native host library (native/libgpode_host.so).

Host-side runtime compute in C++ — k-means for inducing initialization and
adaptive RK45 integration for dataset simulation — replacing the compiled
third-party routines the reference leaned on (scipy kmeans2 / LSODA;
SURVEY.md §2.2). Builds lazily via `make` on first use; callers fall back to
scipy when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgpode_host.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False

RHS_CALLBACK = ctypes.CFUNCTYPE(None, ctypes.c_double,
                                ctypes.POINTER(ctypes.c_double),
                                ctypes.POINTER(ctypes.c_double),
                                ctypes.c_void_p)

SYSTEM_IDS = {"vdp": 0, "fhn": 1}


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gpode_kmeans.restype = ctypes.c_int
        lib.gpode_kmeans.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float)]
        lib.gpode_integrate.restype = ctypes.c_int
        lib.gpode_integrate.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
        lib.gpode_integrate_cb.restype = ctypes.c_int
        lib.gpode_integrate_cb.argtypes = [
            RHS_CALLBACK, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def kmeans(data: np.ndarray, k: int, max_iters: int = 100,
           seed: int = 0) -> np.ndarray:
    """Cluster (n, d) float data into k centers (native Lloyd's algorithm)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    data = np.ascontiguousarray(data, dtype=np.float32)
    n, d = data.shape
    centers = np.empty((k, d), dtype=np.float32)
    rc = lib.gpode_kmeans(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d, k,
        max_iters, seed, centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc < 0:
        raise ValueError(f"gpode_kmeans failed (rc={rc}); need n >= k")
    return centers


def integrate(system: str, x0: np.ndarray, ts: np.ndarray,
              params=(), rtol: float = 1e-10, atol: float = 1e-10) -> np.ndarray:
    """Integrate a built-in system ('vdp' mu-param, 'fhn') at times ts.

    x0: (dim,); returns (T, dim) float64.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    x0 = np.ascontiguousarray(x0, dtype=np.float64)
    ts = np.ascontiguousarray(ts, dtype=np.float64)
    params_arr = np.ascontiguousarray(list(params) or [0.0], dtype=np.float64)
    out = np.empty((ts.shape[0], x0.shape[0]), dtype=np.float64)
    rc = lib.gpode_integrate(
        SYSTEM_IDS[system],
        params_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), x0.shape[0],
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), ts.shape[0],
        rtol, atol, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError(f"gpode_integrate failed (rc={rc})")
    return out


def integrate_callback(f, x0: np.ndarray, ts: np.ndarray,
                       rtol: float = 1e-10, atol: float = 1e-10) -> np.ndarray:
    """Integrate dy/dt = f(t, y) for a Python callable f returning (dim,)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    x0 = np.ascontiguousarray(x0, dtype=np.float64)
    dim = x0.shape[0]

    @RHS_CALLBACK
    def cb(t, y_ptr, dy_ptr, _ctx):
        y = np.ctypeslib.as_array(y_ptr, shape=(dim,))
        dy = np.asarray(f(t, y), dtype=np.float64)
        for j in range(dim):
            dy_ptr[j] = dy[j]

    ts = np.ascontiguousarray(ts, dtype=np.float64)
    out = np.empty((ts.shape[0], dim), dtype=np.float64)
    rc = lib.gpode_integrate_cb(
        cb, None, x0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), dim,
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), ts.shape[0],
        rtol, atol, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError(f"gpode_integrate_cb failed (rc={rc})")
    return out
