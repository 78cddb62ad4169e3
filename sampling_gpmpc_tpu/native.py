"""ctypes bindings for the native C++ QP solver (host-side runtime).

Builds ``native/libsgpmpc_qp.so`` on demand with g++ and exposes
:func:`solve_qp_soft_native` with the same problem signature as the XLA
solver — used as a cross-implementation oracle in tests and as a host
fallback executor.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")


def build(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    nd = _native_dir()
    src = os.path.join(nd, "sgpmpc_qp.cpp")
    so = os.path.join(nd, "libsgpmpc_qp.so")
    if force or not os.path.exists(so) or (
            os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", so, src],
            check=True, capture_output=True)
    return so


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        _LIB = ctypes.CDLL(build())
        fn = _LIB.sgpmpc_solve_qp_soft
        dp = ctypes.POINTER(ctypes.c_double)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                       dp, dp, dp, dp, dp, dp, dp, dp, dp, dp, dp,
                       ctypes.c_double, ctypes.c_int, dp, dp,
                       ctypes.POINTER(ctypes.c_int)]
    return _LIB


def solve_qp_soft_native(H, g, G_h, d_h, G_s, lo_s, hi_s, zl, zu, Zl, Zu,
                         tol: float = 1e-8, max_iter: int = 150):
    """Solve the structured soft-constraint QP with the C++ backend.

    Returns (u, gap, iters, status) — mirrors ocp.qp.solve_qp_soft.
    """
    def arr(x):
        return np.ascontiguousarray(np.asarray(x, dtype=np.float64))

    H, g = arr(H), arr(g)
    G_h, d_h = arr(G_h), arr(d_h)
    G_s, lo_s, hi_s = arr(G_s), arr(lo_s), arr(hi_s)
    zl, zu, Zl, Zu = arr(zl), arr(zu), arr(Zl), arr(Zu)
    nU = g.shape[0]
    mh = d_h.shape[0]
    ms = lo_s.shape[0]
    u = np.zeros(nU)
    gap = ctypes.c_double(0.0)
    iters = ctypes.c_int(0)
    dp = ctypes.POINTER(ctypes.c_double)

    def p(x):
        return x.ctypes.data_as(dp)

    status = _lib().sgpmpc_solve_qp_soft(
        nU, mh, ms, p(H), p(g), p(G_h), p(d_h), p(G_s), p(lo_s), p(hi_s),
        p(zl), p(zu), p(Zl), p(Zu), tol, max_iter,
        p(u), ctypes.byref(gap), ctypes.byref(iters))
    return u, gap.value, iters.value, status
