"""ctypes binding for the independent C++/OpenMP MTTKRP (mttkrp_ref.cpp).

Used only by scripts/bench_mttkrp_external.py as an external comparator
(the same-host stand-in for the reference's CTF/PLANC comparison binaries,
reference src/experiments/benchmark_other_mttkrp.cpp). Builds
libmttkrp_ref.so on first use; importing raises if the toolchain is
unavailable, and the benchmark simply skips the contender.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmttkrp_ref.so")


def _load():
    # Always invoke make: a no-op when the .so is fresh, a rebuild when
    # mttkrp_ref.cpp changed (an exists-only check would silently load a
    # stale binary into the benchmark).
    subprocess.run(
        ["make", "-C", _DIR, "libmttkrp_ref.so"],
        check=True,
        capture_output=True,
    )
    lib = ctypes.CDLL(_SO)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.mttkrp3_f64.restype = None
    lib.mttkrp3_f64.argtypes = [
        dp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        dp, dp, dp, ctypes.c_int64, ctypes.c_int, dp,
    ]
    return lib


_LIB = _load()


def mttkrp3(x: np.ndarray, factors, mode: int) -> np.ndarray:
    """3-D MTTKRP, fp64, C-order arrays. Returns [I_mode, R]."""
    assert x.ndim == 3 and len(factors) == 3 and 0 <= mode < 3
    x = np.ascontiguousarray(x, dtype=np.float64)
    fs = [np.ascontiguousarray(f, dtype=np.float64) for f in factors]
    r = fs[0].shape[1]
    out = np.zeros((x.shape[mode], r), dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    _LIB.mttkrp3_f64(
        x.ctypes.data_as(dp), x.shape[0], x.shape[1], x.shape[2],
        fs[0].ctypes.data_as(dp), fs[1].ctypes.data_as(dp),
        fs[2].ctypes.data_as(dp), r, mode, out.ctypes.data_as(dp),
    )
    return out
