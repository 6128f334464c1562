"""Tensor file IO in the reference's text format.

Format (reference /root/reference/src/tensor.cpp:35-65): first line holds
the mode sizes, then one value per line in column-major order (first mode
fastest). The reference stores tensors column-major; JAX arrays are
row-major, so values are transposed on the way in/out — the on-disk format
is identical.

Uses the native parser (native/tensorio.cpp) when available — the Python
line loop is ~50x slower on 100^3+ tensors — with a NumPy fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO = os.path.join(_DIR, "libtensorio.so")
_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        try:
            if not os.path.exists(_SO):
                subprocess.run(
                    ["make", "-C", _DIR, "libtensorio.so"],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.tensor_file_modes.restype = ctypes.c_int
            lib.tensor_file_read.restype = ctypes.c_int64
            lib.tensor_file_write.restype = ctypes.c_int
            _LIB = lib
        except Exception:
            _LIB = False
    return _LIB or None


def read_tensor(path: str) -> np.ndarray:
    """Read a tensor file; returns a row-major ndarray of the stated
    shape. The reference text format (first line = mode sizes, one value
    per line, column-major — tensor.cpp:35-65) is the default; ``.npy``
    / ``.npz`` files load directly (the npz must hold a single array or
    one named 'x')."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if path.endswith(".npy"):
        return np.asarray(np.load(path), dtype=np.float64)
    if path.endswith(".npz"):
        z = np.load(path)
        key = "x" if "x" in z.files else z.files[0]
        return np.asarray(z[key], dtype=np.float64)
    lib = _lib()
    if lib is not None:
        modes = np.zeros(16, dtype=np.int64)
        n = lib.tensor_file_modes(
            path.encode(), modes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 16
        )
        if n <= 0:
            raise IOError(f"bad tensor file header: {path}")
        shape = tuple(int(m) for m in modes[:n])
        total = int(np.prod(shape))
        flat = np.empty(total, dtype=np.float64)
        got = lib.tensor_file_read(
            path.encode(),
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            total,
        )
        if got != total:
            raise IOError(f"tensor file truncated: {path} ({got}/{total})")
    else:  # NumPy fallback
        with open(path) as f:
            shape = tuple(int(t) for t in f.readline().split())
            flat = np.loadtxt(f, dtype=np.float64)
        total = int(np.prod(shape))
        if flat.size != total:
            raise IOError(f"tensor file truncated: {path}")
    # column-major on disk -> row-major array
    return flat.reshape(shape, order="F")


def write_tensor(path: str, x: np.ndarray) -> None:
    x = np.asarray(x, dtype=np.float64)
    flat = np.asfortranarray(x).ravel(order="F")
    lib = _lib()
    if lib is not None:
        modes = np.asarray(x.shape, dtype=np.int64)
        rc = lib.tensor_file_write(
            path.encode(),
            modes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(x.shape),
            np.ascontiguousarray(flat).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)
            ),
            flat.size,
        )
        if rc != 0:
            raise IOError(f"tensor write failed: {path}")
        return
    with open(path, "w") as f:
        f.write(" ".join(str(m) for m in x.shape) + "\n")
        for v in flat:
            f.write(f"{v:.17g}\n")
