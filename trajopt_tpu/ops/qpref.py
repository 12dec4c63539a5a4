"""ctypes bindings for the native C++ ADMM oracle (native/qpref.cpp).

Plays the reference's multi-backend validation role (its solver-contract
tests run over every available native QP backend,
trajopt_sco/test/small-problems-unit.cpp:184): an independent
double-precision host-side solver to cross-check the on-device ADMM.

The shared library is built on demand with g++ into a cache directory.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "qpref.cpp")
_CACHE = os.environ.get("TRAJOPT_TPU_NATIVE_CACHE", "/tmp/trajopt_tpu_native")


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        os.makedirs(_CACHE, exist_ok=True)
        so = os.path.join(_CACHE, "libqpref.so")
        src = os.path.abspath(_SRC)
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                check=True)
        lib = ctypes.CDLL(so)
        lib.qpref_solve.restype = ctypes.c_int
        lib.qpref_solve.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
        return lib


def qpref_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def solve_qp_ref(P, q, A, l, u, eps_abs=1e-6, eps_rel=1e-8, max_iter=20000):
    """Solve one dense QP with the native oracle. Returns (x, y, status, iters)."""
    lib = _load()
    P = np.ascontiguousarray(P, dtype=np.float64)
    q = np.ascontiguousarray(q, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    l = np.ascontiguousarray(l, dtype=np.float64)
    u = np.ascontiguousarray(u, dtype=np.float64)
    n, m = q.size, l.size
    x = np.zeros(n)
    y = np.zeros(m)
    iters = ctypes.c_int(0)
    dp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    status = lib.qpref_solve(n, m, dp(P), dp(q), dp(A), dp(l), dp(u),
                             eps_abs, eps_rel, max_iter, dp(x), dp(y),
                             ctypes.byref(iters))
    return x, y, int(status), int(iters.value)
