"""ctypes bindings for the native C++ grid index (native/gridindex.cpp).

The library is built on first use (make -C native); if the toolchain or the
build is unavailable, callers fall back to the vectorized numpy paths
(transforms.min_z_in_radius_numpy, scipy cKDTree) — same results, slower.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("stratanet2_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgridindex.so"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as err:  # pragma: no cover
        logger.warning("native gridindex build failed: %s", err)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as err:  # pragma: no cover
            logger.warning("native gridindex load failed: %s", err)
            return None
        dp = ctypes.POINTER(ctypes.c_double)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.minz_in_radius.argtypes = [dp, dp, ctypes.c_int64, ctypes.c_double, dp]
        lib.disk_query_count.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int64, ctypes.c_double, i64p]
        lib.disk_query_fill.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int64, ctypes.c_double, i64p, i32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def min_z_in_radius(xy: np.ndarray, z: np.ndarray, radius: float) -> np.ndarray:
    lib = _load()
    assert lib is not None
    xy = np.ascontiguousarray(xy, np.float64)
    z = np.ascontiguousarray(z, np.float64)
    n = len(z)
    out = np.empty(n, np.float64)
    lib.minz_in_radius(_dptr(xy), _dptr(z), n, float(radius), _dptr(out))
    return out


def disk_query(
    xy: np.ndarray, centers: np.ndarray, radius: float
) -> Tuple[np.ndarray, np.ndarray]:
    """CSR disk query: returns (offsets (M+1,) int64, indices int32) — the
    point indices within `radius` of center q are
    indices[offsets[q]:offsets[q+1]]."""
    lib = _load()
    assert lib is not None
    xy = np.ascontiguousarray(xy, np.float64)
    centers = np.ascontiguousarray(centers, np.float64)
    n, m = len(xy), len(centers)
    counts = np.empty(m, np.int64)
    lib.disk_query_count(
        _dptr(xy), n, _dptr(centers), m, float(radius),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    offsets = np.zeros(m + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    out = np.empty(int(offsets[-1]), np.int32)
    lib.disk_query_fill(
        _dptr(xy), n, _dptr(centers), m, float(radius),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return offsets, out
