"""ctypes bindings to the native C++ runtime components (native/*.cpp).

The reference's only native touchpoints are a raw LAPACK ccall for the
banded eigensolver (Julia/common.jl:28-48) and vendor-library loaders; this
module is their first-class equivalent: ``band_eigh`` (C++ tred2/tql2
banded symmetric eigensolver) and ``read_matrix_market`` (buffered C++
MatrixMarket parser).  The shared library is built on demand with the
repo's ``native/Makefile`` and cached; every entry point has a pure-Python
fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librbl_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                    capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.rbl_band_eigh.restype = ctypes.c_int
            lib.rbl_band_eigh.argtypes = [
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.rbl_mm_open.restype = ctypes.c_int
            lib.rbl_mm_open.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ]
            lib.rbl_mm_read.restype = ctypes.c_int
            lib.rbl_mm_read.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.rbl_mm_close.restype = None
            lib.rbl_mm_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def band_eigh(band: np.ndarray):
    """All eigenpairs of a symmetric banded matrix (LAPACK lower-band
    storage, same layout as scipy.linalg.eig_banded(lower=True)).

    Returns (w ascending, V) with V[:, j] the j-th eigenvector.  Uses the
    native C++ tred2/tql2 solver; raises RuntimeError if the library is
    unavailable (callers choose their own fallback)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no C++ toolchain?)")
    band = np.ascontiguousarray(band, dtype=np.float64)
    bw1, m = band.shape
    w = np.empty(m, dtype=np.float64)
    V = np.empty((m, m), dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    info = lib.rbl_band_eigh(
        m, bw1,
        band.ctypes.data_as(dp), w.ctypes.data_as(dp), V.ctypes.data_as(dp),
    )
    if info != 0:
        raise RuntimeError(f"rbl_band_eigh failed: info={info}")
    return w, V


def read_matrix_market(path: str):
    """Parse a MatrixMarket coordinate file with the native reader.

    Returns a scipy.sparse COO matrix (symmetric/skew storage expanded).
    Raises RuntimeError if the library is unavailable or the file uses an
    unsupported MatrixMarket flavor (callers fall back to scipy.io.mmread).
    """
    import scipy.sparse as sp

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    handle = ctypes.c_void_p()
    nrows = ctypes.c_int64()
    ncols = ctypes.c_int64()
    nnz = ctypes.c_int64()
    symcode = ctypes.c_int()
    rc = lib.rbl_mm_open(
        path.encode(), ctypes.byref(handle), ctypes.byref(nrows),
        ctypes.byref(ncols), ctypes.byref(nnz), ctypes.byref(symcode),
    )
    if rc != 0:
        raise RuntimeError(f"rbl_mm_open({path}) failed: rc={rc}")
    try:
        rows = np.empty(nnz.value, dtype=np.int64)
        cols = np.empty(nnz.value, dtype=np.int64)
        vals = np.empty(nnz.value, dtype=np.float64)
        lp = ctypes.POINTER(ctypes.c_int64)
        dp = ctypes.POINTER(ctypes.c_double)
        rc = lib.rbl_mm_read(
            handle, rows.ctypes.data_as(lp), cols.ctypes.data_as(lp),
            vals.ctypes.data_as(dp),
        )
        if rc != 0:
            raise RuntimeError(f"rbl_mm_read({path}) failed: rc={rc}")
    finally:
        lib.rbl_mm_close(handle)
    if symcode.value:  # expand symmetric / skew-symmetric storage
        off = rows != cols
        sign = -1.0 if symcode.value == 2 else 1.0
        rows, cols, vals = (
            np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
            np.concatenate([vals, sign * vals[off]]),
        )
    return sp.coo_matrix(
        (vals, (rows, cols)), shape=(nrows.value, ncols.value)
    )
