"""ctypes bindings for the native (C++/OpenMP) preprocessing library.

Provides :func:`chi_p_prior_given_chi_eff_q_batch`, the batched/threaded
replacement for the per-scalar-sample Python KDE path that dominates
effective-spin catalog preprocessing.  Builds on first use if the shared
library is missing (``make -C native``); every entry point falls back to the
pure-Python implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["native_available", "chi_p_prior_given_chi_eff_q_batch"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgwinferno_native.so")
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.chi_p_prior_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.c_int,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.chi_p_prior_batch.restype = None
    lib.chi_p_prior_num_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available():
    return _load() is not None


def chi_p_prior_given_chi_eff_q_batch(chi_p, chi_eff, q, a_max=1.0, ndraws=10000, seed=0):
    """Vector of p(chi_p_i | chi_eff_i, q_i) over sample triples.

    Uses the OpenMP C++ kernel when available (orders of magnitude faster
    than the per-sample scipy KDE loop); otherwise falls back to the
    vectorized-python path.
    """
    chi_p = np.ascontiguousarray(np.atleast_1d(chi_p), dtype=np.float64)
    chi_eff = np.ascontiguousarray(np.broadcast_to(chi_eff, chi_p.shape), dtype=np.float64).copy()
    q = np.ascontiguousarray(np.broadcast_to(q, chi_p.shape), dtype=np.float64).copy()
    n = chi_p.shape[0]
    lib = _load()
    if lib is None:
        from .priors import chi_p_prior_given_chi_eff_q

        f = np.vectorize(chi_p_prior_given_chi_eff_q, excluded=["a_max", "ndraws"])
        return f(chi_p, chi_eff, q, a_max=a_max, ndraws=ndraws)
    out = np.empty(n, dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.chi_p_prior_batch(
        chi_p.ctypes.data_as(dp),
        chi_eff.ctypes.data_as(dp),
        q.ctypes.data_as(dp),
        ctypes.c_int64(n),
        ctypes.c_double(a_max),
        ctypes.c_int(int(ndraws)),
        ctypes.c_uint64(int(seed)),
        out.ctypes.data_as(dp),
    )
    return out
