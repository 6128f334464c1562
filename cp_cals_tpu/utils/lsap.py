"""Rectangular linear sum assignment (shortest augmenting path).

Self-contained equivalent of the solver the reference vendors from SciPy
(`/root/reference/extern/rectangular_lsap/` — Crouse 2016, DOI
10.1109/TAES.2016.140952), used only for jackknife column-permutation
matching on small R x R score matrices (utils.cpp:53-101). A C++
implementation with a ctypes binding lives in ``native/``; this NumPy
version is the always-available fallback and the test oracle.
"""

from __future__ import annotations

import numpy as np

try:  # optional native implementation (cp_cals_tpu/native/lsap.cpp)
    from ..native import lsap_native as _native
except Exception:  # pragma: no cover - native lib not built
    _native = None


def solve_lsap(cost: np.ndarray, maximize: bool = False) -> np.ndarray:
    """Return col4row: row i is assigned column col4row[i]; total cost is
    minimized (or maximized)."""
    if _native is not None:
        return _native.solve_lsap(cost, maximize)
    return _solve_lsap_py(cost, maximize)


def _solve_lsap_py(cost: np.ndarray, maximize: bool = False) -> np.ndarray:
    cost = np.asarray(cost, dtype=np.float64)
    if maximize:
        cost = -cost
    nr, nc = cost.shape
    transposed = nr > nc
    if transposed:
        cost = cost.T
        nr, nc = nc, nr

    u = np.zeros(nr)
    v = np.zeros(nc)
    col4row = np.full(nr, -1, dtype=np.int64)
    row4col = np.full(nc, -1, dtype=np.int64)

    for cur_row in range(nr):
        # Dijkstra-style search for the shortest augmenting path from cur_row.
        shortest = np.full(nc, np.inf)
        path = np.full(nc, -1, dtype=np.int64)
        done_cols = np.zeros(nc, dtype=bool)
        scanned_rows: list[int] = []
        min_val = 0.0
        i = cur_row
        sink = -1
        while sink == -1:
            scanned_rows.append(i)
            red = min_val + cost[i] - u[i] - v
            upd = ~done_cols & (red < shortest)
            shortest[upd] = red[upd]
            path[upd] = i
            masked = np.where(done_cols, np.inf, shortest)
            j = int(np.argmin(masked))
            min_val = masked[j]
            if not np.isfinite(min_val):
                raise ValueError("infeasible assignment problem")
            done_cols[j] = True
            if row4col[j] == -1:
                sink = j
            else:
                i = int(row4col[j])
        # Dual updates.
        u[cur_row] += min_val
        for i2 in scanned_rows:
            if i2 != cur_row:
                u[i2] += min_val - shortest[col4row[i2]]
        v[done_cols] -= min_val - shortest[done_cols]
        # Augment along the alternating path.
        j = sink
        while True:
            i2 = int(path[j])
            row4col[j] = i2
            col4row[i2], j = j, col4row[i2]
            if i2 == cur_row:
                break

    if transposed:
        out = np.full(nc, -1, dtype=np.int64)  # original-row -> original-col
        # after transpose: col4row maps transposed-rows (orig cols) to
        # transposed-cols (orig rows); invert.
        inv = np.full(nc, -1, dtype=np.int64)
        for r, c in enumerate(col4row):
            inv[c] = r
        return inv
    return col4row
