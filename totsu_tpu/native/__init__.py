"""ctypes bindings for the native C++ reference engine (native/totsu_ref.cpp).

Builds the shared library on first use (g++ -O3, no external deps) and
caches it next to the source. See the C++ file's header for its roles
(oracle / CPU baseline / tiny-problem fallback).
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from totsu_tpu.solver.cone import (ConeLayout, ZERO, RPOS, SOC, RSOC, PSD,
                                   EXP, POW)
from totsu_tpu.solver.params import (SolverParam, SolverStatus,
                                     effective_eps_inf)

_KIND_CODE = {ZERO: 0, RPOS: 1, SOC: 2, RSOC: 3, PSD: 4, EXP: 5, POW: 6}

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "totsu_ref.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libtotsu_ref.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True)
    return _SO


def load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            i32 = ctypes.c_int32
            f64p = ctypes.POINTER(ctypes.c_double)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.totsu_proj_exp.restype = None
            lib.totsu_proj_exp.argtypes = [f64p, ctypes.c_int64]
            lib.totsu_proj_pow.restype = None
            lib.totsu_proj_pow.argtypes = [f64p, ctypes.c_int64,
                                           ctypes.c_double]
            lib.totsu_solve_dense.restype = i32
            lib.totsu_solve_dense.argtypes = [
                i32, i32, f64p, f64p, f64p,
                i32, i32p, i32p, i32p, f64p,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_int64, i32,
                f64p, f64p, ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
    return _lib


def solve_native(c, a, b, cone: ConeLayout,
                 param: SolverParam = SolverParam()
                 ) -> Tuple[np.ndarray, np.ndarray, SolverStatus, int]:
    """Solve on the native C++ engine. Returns (x, y, status, iters)."""
    lib = load()
    c = np.ascontiguousarray(np.asarray(c, dtype=np.float64).ravel())
    a = np.ascontiguousarray(np.asarray(a, dtype=np.float64))
    b = np.ascontiguousarray(np.asarray(b, dtype=np.float64).ravel())
    n = c.shape[0]
    m = b.shape[0]
    if a.shape != (m, n):
        raise ValueError(f"A shape {a.shape} != ({m}, {n})")
    if cone.dim != m:
        raise ValueError(f"cone dim {cone.dim} != m {m}")

    for f in cone.factors:
        if f.kind not in _KIND_CODE:
            raise ValueError(
                f"cone kind {f.kind!r} is not supported by the native "
                "engine (user-defined projections run on the JAX path only)")
    kinds = np.asarray([_KIND_CODE[f.kind] for f in cone.factors], np.int32)
    dims = np.asarray([f.dim for f in cone.factors], np.int32)
    counts = np.asarray([f.count for f in cone.factors], np.int32)
    alphas = np.asarray([f.alpha for f in cone.factors], np.float64)

    out_x = np.zeros(n)
    out_y = np.zeros(m)
    out_iters = ctypes.c_int64(0)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)

    status = lib.totsu_solve_dense(
        n, m,
        c.ctypes.data_as(f64p), a.ctypes.data_as(f64p),
        b.ctypes.data_as(f64p),
        len(cone.factors),
        kinds.ctypes.data_as(i32p), dims.ctypes.data_as(i32p),
        counts.ctypes.data_as(i32p), alphas.ctypes.data_as(f64p),
        param.eps_acc, effective_eps_inf(param, np.float64), param.eps_zero,
        param.bounded_max_iter, max(1, param.check_period),
        out_x.ctypes.data_as(f64p), out_y.ctypes.data_as(f64p),
        ctypes.byref(out_iters))
    return out_x, out_y, SolverStatus(status), int(out_iters.value)


def proj_exp_native(points) -> np.ndarray:
    """Exp-cone projection of (count, 3) points on the native engine —
    the projection-level oracle (scalar f64 bisection, independent of
    the JAX fixed-trip Newton path)."""
    lib = load()
    pts = np.ascontiguousarray(np.asarray(points, np.float64)).copy()
    lib.totsu_proj_exp(pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                       pts.shape[0])
    return pts


def proj_pow_native(points, alpha: float) -> np.ndarray:
    """Power-cone projection of (count, 3) points on the native engine."""
    lib = load()
    pts = np.ascontiguousarray(np.asarray(points, np.float64)).copy()
    lib.totsu_proj_pow(pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                       pts.shape[0], float(alpha))
    return pts
