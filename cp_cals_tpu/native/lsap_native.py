"""ctypes binding for the native LSAP solver (lsap.cpp).

Builds liblsap.so on first use if the toolchain is available; importing this
module raises if the library can't be built/loaded, and callers fall back to
the NumPy implementation in utils/lsap.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "liblsap.so")


def _load():
    if not os.path.exists(_SO):
        subprocess.run(
            ["make", "-C", _DIR, "liblsap.so"],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_SO)
    lib.solve_lsap.restype = ctypes.c_int
    lib.solve_lsap.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


_LIB = _load()


def solve_lsap(cost: np.ndarray, maximize: bool = False) -> np.ndarray:
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    nr, nc = cost.shape
    if nr > nc:
        # Solve the transpose and invert the assignment.
        c4r = solve_lsap(cost.T, maximize)
        inv = np.full(nr, -1, dtype=np.int64)
        for r, c in enumerate(c4r):
            inv[c] = r
        return inv
    out = np.empty(nr, dtype=np.int64)
    rc = _LIB.solve_lsap(
        nr,
        nc,
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(maximize),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise ValueError(f"lsap solve failed (rc={rc})")
    return out
