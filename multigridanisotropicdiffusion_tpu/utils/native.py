"""ctypes bindings to the native CPU kernel library (native/libmadref.so).

The library provides the reference's *sequential* smoother semantics
(lexicographic Gauss-Seidel — inherently one-voxel-at-a-time, hence CPU-only)
plus Jacobi/residual/apply kernels in double precision.  Roles:

* independent golden oracle for the TPU-native colored smoothers and
  stencil application (cross-language, cross-implementation check),
* exact-GS convergence-rate comparisons (colored vs lexicographic),
* a CPU execution path with no accelerator dependency.

The shared library is built on demand with ``make`` (g++); everything
degrades gracefully (``is_available() -> False``) when no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmadref.so")


@lru_cache(maxsize=1)
def _load():
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    dp = ctypes.POINTER(ctypes.c_double)
    dpp = ctypes.POINTER(dp)
    common = [ctypes.c_int, i64p, ctypes.c_int, i64p, dpp, dp, dp]
    lib.mad_gs_sweep.argtypes = common + [dp]
    lib.mad_wj_sweep.argtypes = common + [ctypes.c_double, dp]
    lib.mad_residual.argtypes = common + [dp]
    lib.mad_apply.argtypes = [ctypes.c_int, i64p, ctypes.c_int, i64p, dpp, dp, dp]
    for f in (lib.mad_gs_sweep, lib.mad_wj_sweep, lib.mad_residual, lib.mad_apply):
        f.restype = None
    return lib


def is_available() -> bool:
    return _load() is not None


def _prep(op):
    """StencilOperator -> (shape arr, offsets arr, coeff plane ptr array)."""
    shape = np.asarray(op.shape, dtype=np.int64)
    offsets = np.asarray(op.offsets, dtype=np.int64).reshape(-1)
    planes = [
        np.ascontiguousarray(np.asarray(c, dtype=np.float64)) for c in op.coeffs
    ]
    dp = ctypes.POINTER(ctypes.c_double)
    ptrs = (dp * len(planes))(
        *[p.ctypes.data_as(dp) for p in planes]
    )
    return shape, offsets, planes, ptrs


def _as_c(arr):
    return np.ascontiguousarray(np.asarray(arr, dtype=np.float64))


def gs_sweep(op, x, b) -> np.ndarray:
    """Exact lexicographic (C-order) Gauss-Seidel sweep."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    shape, offsets, planes, ptrs = _prep(op)
    x = _as_c(x)
    b = _as_c(b)
    out = np.empty_like(x)
    i64p = ctypes.POINTER(ctypes.c_int64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.mad_gs_sweep(
        len(shape), shape.ctypes.data_as(i64p), len(op.offsets),
        offsets.ctypes.data_as(i64p), ptrs,
        x.ctypes.data_as(dp), b.ctypes.data_as(dp), out.ctypes.data_as(dp),
    )
    return out


def wj_sweep(op, x, b, omega: float = 2.0 / 3.0) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    shape, offsets, planes, ptrs = _prep(op)
    x = _as_c(x)
    b = _as_c(b)
    out = np.empty_like(x)
    i64p = ctypes.POINTER(ctypes.c_int64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.mad_wj_sweep(
        len(shape), shape.ctypes.data_as(i64p), len(op.offsets),
        offsets.ctypes.data_as(i64p), ptrs,
        x.ctypes.data_as(dp), b.ctypes.data_as(dp), ctypes.c_double(omega),
        out.ctypes.data_as(dp),
    )
    return out


def residual(op, x, b) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    shape, offsets, planes, ptrs = _prep(op)
    x = _as_c(x)
    b = _as_c(b)
    out = np.empty_like(x)
    i64p = ctypes.POINTER(ctypes.c_int64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.mad_residual(
        len(shape), shape.ctypes.data_as(i64p), len(op.offsets),
        offsets.ctypes.data_as(i64p), ptrs,
        x.ctypes.data_as(dp), b.ctypes.data_as(dp), out.ctypes.data_as(dp),
    )
    return out


def apply_stencil(op, x) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    shape, offsets, planes, ptrs = _prep(op)
    x = _as_c(x)
    out = np.empty_like(x)
    i64p = ctypes.POINTER(ctypes.c_int64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.mad_apply(
        len(shape), shape.ctypes.data_as(i64p), len(op.offsets),
        offsets.ctypes.data_as(i64p), ptrs,
        x.ctypes.data_as(dp), out.ctypes.data_as(dp),
    )
    return out
