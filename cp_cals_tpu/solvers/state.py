"""Solver state pytrees shared by cp_als and the batched CALS engine.

Replaces the reference's mutable per-model bookkeeping (``cals::Ktensor``
fit/error/iteration fields, include/ktensor.h:25-42; ``RegistryEntry``
gramians, include/multi_ktensor.h:12-23; ``LineSearchParams`` workspaces,
include/utils/line_search.h:13-31) with one immutable pytree. Every field
carries arbitrary leading batch dims: ``()`` for single-model ALS, ``(B,)``
for a CALS bucket — the same jitted iteration serves both.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ktensor import Ktensor
from ..ops.gramians import gramians

Array = jax.Array

# Sentinel "error after extrapolation": the reference sets approx_error to
# +inf and fit to -inf (line_search.cpp:41-42); a large finite value avoids
# inf-inf NaNs in fit differences while still deferring eviction.
BIG_ERROR = 1e30


class LsState(NamedTuple):
    """NO_ERROR_CHECKING line-search carry (reference line_search.h:13-31)."""

    it: Array  # [...] int32 — iteration counter modulo interval
    updated_last: Array  # [...] bool — extrapolated on previous iteration
    prev: Ktensor  # snapshot taken at it == interval-1
    backup: Ktensor  # pre-extrapolation backup for revert
    backup_err: Array
    backup_fit: Array
    backup_old_fit: Array
    backup_iters: Array
    # NNLS warm-start active sets at backup time (reference Ktensor::copy
    # carries active_set, ktensor.cpp:163-181); () when NNLS is off.
    backup_active: tuple = ()


class HiState(NamedTuple):
    """Mixed-tier stopping carry (config.tol_check_interval): the model's
    full-precision fit and iteration count at its last periodic check, so
    the next check can form the per-iteration high-tier fit delta. Checks
    run in adjacent pairs (iterations mK-1 and mK), so the decision check
    usually sees gap == 1 and reads the EXACT single-iteration delta; the
    rate/gap fields only feed the decay-extrapolation fallback for
    phase-shifted (non-adjacent) windows."""

    fit_prev: Array  # [...] — high-tier fit at the previous check
    iters_prev: Array  # [...] int32 — this model's iters at that check
    # Per-iteration high-tier improvement rate measured at the previous
    # check (0 until two checks are on record). Two consecutive window
    # rates expose the geometric decay of the per-iteration fit deltas,
    # letting the stop extrapolate the CURRENT delta instead of the
    # window average (which lags it and inflates iteration counts).
    rate_prev: Array  # [...]
    # Length of rate_prev's window. The decay inference rho^gap =
    # rate/rate_prev only holds for EQUAL windows; after a check-phase
    # shift (e.g. a max_iterations-capped eviction at a non-multiple of
    # K) windows differ and the extrapolation falls back to the raw
    # window rate until two equal windows are on record again.
    gap_prev: Array  # [...] int32


class SolverState(NamedTuple):
    kt: Ktensor  # factors [..., I_n, R], lam [..., R]
    grams: tuple  # per-mode [..., R, R]
    rank_mask: Array  # [..., R] bool — False on padded columns
    iters: Array  # [...] int32
    fit: Array  # [...]
    old_fit: Array
    approx_error: Array
    converged: Array  # [...] bool
    alive: Array  # [...] bool — False for vacant bucket slots
    jk_fiber: Array  # [...] int32, -1 = not a jackknife model
    x_norm_model: Array  # [...] — leave-one-out norm for JK models
    active: tuple  # NNLS active sets, per-mode [..., I_n, R] bool, or ()
    ls: LsState | tuple  # () when line search disabled
    hi: HiState | tuple = ()  # () unless tol_check_interval > 0


def tree_where(cond: Array, a, b):
    """Select pytree leaves by a mask over leading batch dims."""

    def sel(x, y):
        c = cond.reshape(cond.shape + (1,) * (x.ndim - cond.ndim))
        return jnp.where(c, x, y)

    return jax.tree.map(sel, a, b)


def init_state(
    kt: Ktensor,
    x_norm: Array,
    *,
    nnls: bool = False,
    line_search: bool = False,
    jk_fiber=None,
    x_norm_model=None,
    rank_mask=None,
    alive: bool = True,
    precision=jax.lax.Precision.HIGHEST,
    mixed_tol: bool = False,
) -> SolverState:
    """Build the initial solver state for a (possibly batched) Ktensor.

    Mirrors the setup in cp_als (reference src/als.cpp:114-119: gramians of
    the initial guess) and MultiKtensor::add (src/multi_ktensor.cpp:41-130:
    per-model gramians + iters = 1 semantics via iters starting at 0 and the
    first iteration incrementing).
    """
    batch_shape = kt.lam.shape[:-1]
    r = kt.rank
    f = jnp.zeros(batch_shape, kt.lam.dtype)
    i0 = jnp.zeros(batch_shape, jnp.int32)
    grams = gramians(kt.factors, precision)
    if rank_mask is None:
        rank_mask = jnp.ones(batch_shape + (r,), bool)
    if jk_fiber is None:
        jk_fiber = jnp.full(batch_shape, -1, jnp.int32)
    else:
        jk_fiber = jnp.broadcast_to(jnp.asarray(jk_fiber, jnp.int32), batch_shape)
    if x_norm_model is None:
        x_norm_model = jnp.broadcast_to(jnp.asarray(x_norm, kt.lam.dtype), batch_shape)
    active = (
        tuple(jnp.ones(fac.shape, bool) for fac in kt.factors) if nnls else ()
    )
    if line_search:
        ls = LsState(
            it=i0,
            updated_last=jnp.zeros(batch_shape, bool),
            prev=kt,
            backup=kt,
            backup_err=f,
            backup_fit=f,
            backup_old_fit=f,
            backup_iters=i0,
            backup_active=active,
        )
    else:
        ls = ()
    hi = (
        HiState(fit_prev=f, iters_prev=i0, rate_prev=f, gap_prev=i0)
        if mixed_tol
        else ()
    )
    return SolverState(
        kt=kt,
        grams=grams,
        rank_mask=rank_mask,
        iters=i0,
        fit=f,
        old_fit=f,
        approx_error=f,
        converged=jnp.zeros(batch_shape, bool),
        alive=jnp.full(batch_shape, alive),
        jk_fiber=jk_fiber,
        x_norm_model=x_norm_model,
        active=active,
        ls=ls,
        hi=hi,
    )
