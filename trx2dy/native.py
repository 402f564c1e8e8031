"""ctypes bindings for the native host-side library (libtrx2dy.so).

Native components (built from native/src via make):
  * trx2dy_tmscore / trx2dy_tmscore_matrix — the bin/TMscore replacement for
    host-side all-vs-all evaluation and clustering,
  * trx2dy_parse_a3m — fast MSA parsing for the batch driver.

The library is compiled on first use (g++ is in the image); every caller has
a pure-python/JAX fallback, so a missing toolchain degrades gracefully.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtrx2dy.so")
_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.trx2dy_tmscore.restype = ctypes.c_int
    lib.trx2dy_tmscore.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double)]
    lib.trx2dy_tmscore_matrix.restype = ctypes.c_int
    lib.trx2dy_tmscore_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    lib.trx2dy_parse_a3m.restype = ctypes.c_int
    lib.trx2dy_parse_a3m.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def tmscore(pred_ca: np.ndarray, native_ca: np.ndarray
            ) -> Optional[Tuple[float, float]]:
    """(tm, rmsd) of two index-aligned (L, 3) CA traces; None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(pred_ca, np.float64)
    q = np.ascontiguousarray(native_ca, np.float64)
    assert p.shape == q.shape and p.ndim == 2 and p.shape[1] == 3
    tm = ctypes.c_double()
    rmsd = ctypes.c_double()
    rc = lib.trx2dy_tmscore(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        p.shape[0], ctypes.byref(tm), ctypes.byref(rmsd))
    if rc != 0:
        return None
    return tm.value, rmsd.value


def tmscore_matrix(coords: np.ndarray
                   ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """All-vs-all (tm, rmsd) matrices for (M, L, 3) CA traces."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(coords, np.float64)
    m, n = c.shape[0], c.shape[1]
    tm = np.zeros((m, m))
    rmsd = np.zeros((m, m))
    rc = lib.trx2dy_tmscore_matrix(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m, n,
        tm.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rmsd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        return None
    return tm, rmsd


def parse_a3m(path: str, limit: int = 20000,
              max_len: int = 8192) -> Optional[np.ndarray]:
    """Native a3m parse; None if unavailable (callers fall back to
    trx2dy.io.a3m.parse_a3m)."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((limit, max_len), np.uint8)
    seq_len = ctypes.c_int()
    rows = lib.trx2dy_parse_a3m(
        path.encode(), limit,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), max_len,
        ctypes.byref(seq_len))
    if rows < 0:
        return None
    L = seq_len.value
    return out[:rows].reshape(-1)[:rows * L].reshape(rows, L).copy()
