"""ctypes bindings for the native box-constrained solver (native/box_solver.cpp).

The reference's single native component is the IPOPT C++ NLP solver, driven
through Python callbacks (mpc.py:298-326). This module plays the same
structural role for the TPU build: a host-side C++ solver with a Python
objective/gradient callback, used as a cross-validation oracle for the jitted
on-device solver and as a dependency-free CPU fallback. Built on demand with
the repo Makefile (g++, no third-party deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Callable, NamedTuple, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libgpmpc_native.so')

_OBJ_GRAD = ctypes.CFUNCTYPE(ctypes.c_double,
                             ctypes.POINTER(ctypes.c_double),
                             ctypes.POINTER(ctypes.c_double),
                             ctypes.c_int, ctypes.c_void_p)


class _CStats(ctypes.Structure):
    _fields_ = [('iterations', ctypes.c_int),
                ('func_evals', ctypes.c_int),
                ('final_objective', ctypes.c_double),
                ('pg_norm', ctypes.c_double),
                ('converged', ctypes.c_int)]


class NativeSolveResult(NamedTuple):
    x: np.ndarray
    objective: float
    iterations: int
    func_evals: int
    pg_norm: float
    converged: bool


_lib = None


def _build() -> None:
    subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                   capture_output=True)


def load_library(rebuild: bool = False):
    """Build (if needed) and load the native solver library."""
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    if rebuild or not os.path.exists(_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.gpmpc_solve_box.restype = ctypes.c_int
    lib.gpmpc_solve_box.argtypes = [
        _OBJ_GRAD, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_double, ctypes.POINTER(_CStats)]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


def solve_box(objective_and_grad: Callable[[np.ndarray],
                                           tuple[float, np.ndarray]],
              x0: np.ndarray,
              lb: np.ndarray, ub: np.ndarray,
              max_iters: int = 300, tol: float = 1e-6) -> NativeSolveResult:
    """Minimize f over the box [lb, ub] with the native projected L-BFGS.

    objective_and_grad(x) -> (f, grad) with x, grad of shape (n,).
    """
    lib = load_library()
    n = int(np.asarray(x0).size)
    x = np.ascontiguousarray(np.asarray(x0, np.float64).ravel())
    lb = np.ascontiguousarray(np.broadcast_to(
        np.asarray(lb, np.float64), (n,)))
    ub = np.ascontiguousarray(np.broadcast_to(
        np.asarray(ub, np.float64), (n,)))

    err: list = []

    @_OBJ_GRAD
    def cb(x_ptr, g_ptr, n_c, _user):
        try:
            xv = np.ctypeslib.as_array(x_ptr, shape=(n_c,)).copy()
            f, g = objective_and_grad(xv)
            gv = np.ctypeslib.as_array(g_ptr, shape=(n_c,))
            gv[:] = np.asarray(g, np.float64).ravel()
            return float(f)
        except Exception as e:        # pragma: no cover - diagnostic path
            err.append(e)
            return float('nan')

    stats = _CStats()
    lib.gpmpc_solve_box(
        cb, None,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        lb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ub.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(max_iters), float(tol), ctypes.byref(stats))
    if err:
        raise err[0]
    return NativeSolveResult(x=x, objective=stats.final_objective,
                             iterations=stats.iterations,
                             func_evals=stats.func_evals,
                             pg_norm=stats.pg_norm,
                             converged=bool(stats.converged))
