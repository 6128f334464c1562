"""Approximation-error computation.

TPU-native equivalent of `/root/reference/src/utils/error.cpp`:

* ``fast_error`` — the FastALS formula (error.cpp:64-89, after Phan/
  Tichavsky/Cichocki): err^2 = |X|^2 + lam^T (hadamard of gramians) lam
  - 2 * sum_j lam_j <U_N[:,j], G_last[:,j]>, clamped at 0. O(I_N*R + R^2),
  never touches the tensor. The three terms are O(|X|^2) while the result is
  tiny near convergence, so the reduction runs in the widest enabled dtype
  (fp64 under x64; see config.error_dtype) — the fp32-TPU analog of the
  reference's all-double arithmetic.
* ``reconstruction_error`` — exact |X - X_hat| by dense reconstruction
  (error.cpp:7-30), the test oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import error_dtype
from ..ktensor import Ktensor, denormalize, to_tensor

Array = jax.Array


# ---------------------------------------------------------------------------
# Double-float ("df") compensated arithmetic for the fp32 TPU path.
#
# The FastALS error err^2 = |X|^2 + lam^T H lam - 2*term3 subtracts terms of
# magnitude O(|X|^2) to produce a result that is ~1e-5*|X|^2 near
# convergence: in plain fp32 both the summations (~sqrt(n)*eps*|X|^2) and
# the final cancellation destroy every significant digit below tol ~1e-5.
# The reference sidesteps this with all-double BLAS (error.cpp:64-89); TPUs
# have no fast fp64, so the reduction runs in error-free-transformed f32
# pairs (Dekker/Knuth TwoSum/TwoProd): each value is (hi, lo) with
# hi + lo exact to ~2^-48. The O(B*I*R) VPU cost is noise next to the
# MTTKRP. XLA preserves IEEE add/mul semantics (no reassociation), which
# these transforms rely on.
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _fast_two_sum(a, b):
    """Dekker FastTwoSum (requires |a| >= |b|, which df_add guarantees)."""
    s = a + b
    return s, b - (s - a)


def _split_const(dtype):
    # 2^ceil(p/2) + 1 with p = mantissa bits: 4097 for f32, 2^27+1 for f64.
    return 4097.0 if jnp.dtype(dtype) == jnp.float32 else 134217729.0


def _two_prod(a, b):
    """Dekker TwoProd (FMA-free): p + e == a * b exactly."""
    c = jnp.asarray(_split_const(a.dtype), a.dtype)
    ca = c * a
    a_hi = ca - (ca - a)
    a_lo = a - a_hi
    cb = c * b
    b_hi = cb - (cb - b)
    b_lo = b - b_hi
    p = a * b
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def _df_add(x, y):
    s, e = _two_sum(x[0], y[0])
    return _fast_two_sum(s, e + x[1] + y[1])


def _df_sum(hi: Array, lo: Array) -> tuple[Array, Array]:
    """Tree-fold a df array over its LAST axis into one df value per batch
    element: log2(n) vectorized df_add rounds (error stays at eps^2 level
    regardless of n, unlike sequential or plain-tree f32 summation)."""
    n = hi.shape[-1]
    p = 1
    while p < n:
        p *= 2
    pad = [(0, 0)] * (hi.ndim - 1) + [(0, p - n)]
    hi = jnp.pad(hi, pad)
    lo = jnp.pad(lo, pad)
    while hi.shape[-1] > 1:
        h = hi.shape[-1] // 2
        hi, lo = _df_add(
            (hi[..., :h], lo[..., :h]), (hi[..., h:], lo[..., h:])
        )
    return hi[..., 0], lo[..., 0]


def fast_error(
    x_norm: Array,
    lam: Array,
    last_factor: Array,
    last_mttkrp: Array,
    gramian_hadamard: Array,
) -> Array:
    """Batched FastALS error.

    x_norm:           [...] per-model norm of the (possibly jackknifed) target.
    lam:              [..., R]
    last_factor:      [..., I_N, R] (normalized U_N)
    last_mttkrp:      [..., I_N, R] (G_last, saved before the mode-N update)
    gramian_hadamard: [..., R, R] elementwise product of ALL gramians.
    """
    dt = error_dtype()
    if jnp.dtype(dt) == jnp.float64:
        # fp64 available (CPU oracle / x64 builds): plain wide reduction.
        lam64 = lam.astype(dt)
        term2 = jnp.einsum(
            "...i,...j,...ij->...", lam64, lam64, gramian_hadamard.astype(dt)
        )
        term3 = jnp.einsum(
            "...j,...ij,...ij->...",
            lam64,
            last_factor.astype(dt),
            last_mttkrp.astype(dt),
        )
        x_norm = (
            x_norm.astype(dt)
            if hasattr(x_norm, "astype")
            else jnp.asarray(x_norm, dt)
        )
        err2 = jnp.maximum(x_norm * x_norm + term2 - 2.0 * term3, 0.0)
        return jnp.sqrt(err2).astype(lam.dtype)
    return _fast_error_compensated(
        x_norm, lam, last_factor, last_mttkrp, gramian_hadamard
    )


def _fast_error_compensated(
    x_norm, lam, last_factor, last_mttkrp, gramian_hadamard
) -> Array:
    """fp32 TPU path: the same reduction in double-float arithmetic.

    Every product enters as an exact (hi, lo) pair and the sums/cancellation
    run at ~2^-48 — the iteration-to-iteration noise floor of the computed
    error is then set by the MTTKRP/gramian kernels' own f32 rounding, not
    by this reduction (the fp32 analog of the reference's all-double
    error.cpp:64-89; SURVEY §7 hard part).
    """
    dtype = lam.dtype
    x_norm = jnp.asarray(x_norm, dtype)

    # term3 = sum_{i,j} lam_j * U[i,j] * G[i,j] as exact triple products.
    p1, e1 = _two_prod(last_factor, last_mttkrp)  # [..., I, R]
    lam_b = lam[..., None, :]
    p2, e2 = _two_prod(p1, jnp.broadcast_to(lam_b, p1.shape))
    t3_hi = p2.reshape(*p2.shape[:-2], -1)
    t3_lo = (e2 + e1 * lam_b).reshape(*p2.shape[:-2], -1)
    t3 = _df_sum(t3_hi, t3_lo)

    # term2 = sum_{i,j} lam_i * lam_j * H_ij.
    ll_hi, ll_lo = _two_prod(
        jnp.broadcast_to(lam[..., :, None], gramian_hadamard.shape),
        jnp.broadcast_to(lam[..., None, :], gramian_hadamard.shape),
    )
    q_hi, q_lo = _two_prod(ll_hi, gramian_hadamard)
    t2_hi = q_hi.reshape(*q_hi.shape[:-2], -1)
    t2_lo = (q_lo + ll_lo * gramian_hadamard).reshape(*q_hi.shape[:-2], -1)
    t2 = _df_sum(t2_hi, t2_lo)

    xn2 = _two_prod(x_norm, x_norm)

    acc = _df_add(xn2, t2)
    acc = _df_add(acc, (-2.0 * t3[0], -2.0 * t3[1]))
    err2 = jnp.maximum(acc[0] + acc[1], 0.0)
    return jnp.sqrt(err2).astype(dtype)


def fast_error_from_cols(
    x_norm: Array,
    lam: Array,
    t3_hi: Array,
    t3_lo: Array,
    gramian_hadamard: Array,
) -> Array:
    """FastALS error from precomputed term-3 column sums.

    The fused epilogue kernel (ops/pallas_epilogue.py) emits the O(B*I*R)
    inner products Σ_i U_N[i,j]·G_last[i,j] per column as double-float
    (hi, lo) pairs [..., R] while U and G are still in VMEM; this finishes
    the FastALS formula (error.cpp:64-89) on the remaining tiny terms.
    """
    dt = error_dtype()
    if jnp.dtype(dt) == jnp.float64:
        lam64 = lam.astype(dt)
        t3 = jnp.sum(
            lam64 * (t3_hi.astype(dt) + t3_lo.astype(dt)), axis=-1
        )
        term2 = jnp.einsum(
            "...i,...j,...ij->...", lam64, lam64, gramian_hadamard.astype(dt)
        )
        xn = jnp.asarray(x_norm, dt)
        err2 = jnp.maximum(xn * xn + term2 - 2.0 * t3, 0.0)
        return jnp.sqrt(err2).astype(lam.dtype)

    dtype = lam.dtype
    x_norm = jnp.asarray(x_norm, dtype)
    # term3 = Σ_j lam_j * (t3_hi + t3_lo)_j, exactly.
    p, e = _two_prod(lam, t3_hi)
    t3 = _df_sum(p, e + lam * t3_lo)
    # term2 as in _fast_error_compensated.
    ll_hi, ll_lo = _two_prod(
        jnp.broadcast_to(lam[..., :, None], gramian_hadamard.shape),
        jnp.broadcast_to(lam[..., None, :], gramian_hadamard.shape),
    )
    q_hi, q_lo = _two_prod(ll_hi, gramian_hadamard)
    t2 = _df_sum(
        q_hi.reshape(*q_hi.shape[:-2], -1),
        (q_lo + ll_lo * gramian_hadamard).reshape(*q_hi.shape[:-2], -1),
    )
    xn2 = _two_prod(x_norm, x_norm)
    acc = _df_add(xn2, t2)
    acc = _df_add(acc, (-2.0 * t3[0], -2.0 * t3[1]))
    err2 = jnp.maximum(acc[0] + acc[1], 0.0)
    return jnp.sqrt(err2).astype(dtype)


def reconstruction_error(x: Array, kt: Ktensor) -> Array:
    """|X - full(kt)| by dense reconstruction (test oracle)."""
    xhat = to_tensor(denormalize(kt))
    return jnp.linalg.norm((x - xhat).ravel())
