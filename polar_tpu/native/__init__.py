"""Native host-side runtime components (C++ via ctypes).

The TPU compute path is JAX/XLA/Pallas; host-side hot construction code is
native C++. ``ga.cpp`` is compiled on demand with the local ``g++`` (no
pip/network) into a cached shared object; every native entry point has a
pure-NumPy twin so the package still works without a toolchain
(``tests/test_construction.py`` asserts native == NumPy when both exist).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ga.cpp")
_LIB_PATH = os.path.join(_DIR, "libpolarga.so")
_lib = None
_build_error = None


def _build():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ga_bit_channel_means.restype = ctypes.c_int
        lib.ga_bit_channel_means.argtypes = [
            ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception as e:  # no toolchain / sandbox: NumPy twin takes over
        _build_error = e


def have_native() -> bool:
    _build()
    return _lib is not None


# --- NumPy twin of ga.cpp (same approximations, same recursion) ---

def _phi(m):
    m = np.asarray(m, dtype=np.float64)
    out = np.ones_like(m)
    small = (m > 0) & (m < 10.0)
    out[small] = np.exp(0.0218 - 0.4527 * np.power(m[small], 0.86))
    big = m >= 10.0
    mb = m[big]
    out[big] = np.sqrt(np.pi / mb) * np.exp(-mb / 4.0) * (1 - 10 / (7 * mb))
    return out


def _phi_inv(y):
    y = float(y)
    if y >= 1.0:
        return 0.0
    if y <= 0.0:
        return 1e9  # saturated channel (phi underflow) — same cap as ga.cpp
    lo, hi = 0.0, 1.0
    while float(_phi(hi)) > y and hi < 1e9:
        hi *= 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if float(_phi(mid)) > y:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-12 * (1.0 + hi):
            break
    return 0.5 * (lo + hi)


def _ga_means_numpy(n: int, m0: float) -> np.ndarray:
    means = np.empty(n, dtype=np.float64)
    means[0] = m0
    width = 1
    while width < n:
        for i in range(width - 1, -1, -1):
            m = means[i]
            pm = float(_phi(np.array(m)))
            means[2 * i] = _phi_inv(1.0 - (1.0 - pm) ** 2)
            means[2 * i + 1] = 2.0 * m
        width *= 2
    return means


def ga_bit_channel_means(n: int, m0: float,
                         force_numpy: bool = False) -> np.ndarray:
    """Gaussian-approximation LLR means of the n synthetic bit-channels
    (u-domain order) for channel LLR mean ``m0 = 2/No``."""
    n = int(n)
    assert n >= 1 and (n & (n - 1)) == 0, "n must be a power of 2"
    if not force_numpy:
        _build()
        if _lib is not None:
            out = np.empty(n, dtype=np.float64)
            rc = _lib.ga_bit_channel_means(
                n, float(m0),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            assert rc == 0
            return out
    return _ga_means_numpy(n, float(m0))
