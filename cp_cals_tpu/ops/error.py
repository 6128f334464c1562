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
    x_norm = x_norm.astype(dt) if hasattr(x_norm, "astype") else jnp.asarray(x_norm, dt)
    err2 = jnp.maximum(x_norm * x_norm + term2 - 2.0 * term3, 0.0)
    return jnp.sqrt(err2).astype(lam.dtype)


def reconstruction_error(x: Array, kt: Ktensor) -> Array:
    """|X - full(kt)| by dense reconstruction (test oracle)."""
    xhat = to_tensor(denormalize(kt))
    return jnp.linalg.norm((x - xhat).ravel())
