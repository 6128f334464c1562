"""Single-model CP-ALS driver.

TPU-native equivalent of ``cals::cp_als`` (`/root/reference/src/als.cpp:19-289`):
the do/while convergence loop becomes a ``lax.while_loop`` so the entire fit
runs as ONE device program with no per-iteration host round-trips. The
"OMP-parallel ALS" baseline (`src/als.cpp:388-413` — one thread per model)
becomes ``cp_vmap_als``: vmap over independent models, one fused program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ..config import AlsParams, UpdateMethod
from ..ktensor import Ktensor
from .iteration import make_iteration
from .state import SolverState, init_state

Array = jax.Array


@dataclass
class AlsReport:
    """Per-fit metadata (reference include/als.h:29-140, minus timer matrices,
    which live in utils/timers.py)."""

    iters: int
    fit: float
    approx_error: float
    converged: bool


@partial(jax.jit, static_argnames=("params",))
def _run_als(
    x: Array,
    kt0: Ktensor,
    jk_fiber: Array,
    x_norm_model: Array | None,
    params: AlsParams,
) -> SolverState:
    x_norm = jnp.linalg.norm(x.ravel())
    state = init_state(
        kt0,
        x_norm,
        nnls=params.update_method == UpdateMethod.NNLS,
        line_search=params.line_search,
        jk_fiber=jk_fiber,
        x_norm_model=x_norm_model,
        mixed_tol=params.tol_check_interval > 0,
    )
    iteration = make_iteration(params, batched=False)

    def cond(s: SolverState):
        return jnp.logical_not(s.converged)

    def body(s: SolverState):
        return iteration(x, s, x_norm)

    return jax.lax.while_loop(cond, body, state)


def cp_als(
    x: Array,
    kt0: Ktensor,
    params: AlsParams = AlsParams(),
    jk_fiber: int = -1,
    x_norm_model=None,
) -> tuple[Ktensor, AlsReport]:
    """Fit one CP model to ``x``. Returns the fitted (normalized) Ktensor.

    jk_fiber >= 0 runs the jackknife variant against the FULL tensor: the
    fiber's row of factor 0 is re-zeroed after every mode-0 update and the
    error uses the leave-one-out norm ``x_norm_model``
    (reference cals.cpp:250-251, 295-301).
    """
    jk = jnp.asarray(jk_fiber, jnp.int32)
    if x_norm_model is not None:
        x_norm_model = jnp.asarray(x_norm_model, kt0.lam.dtype)
    final = _run_als(x, kt0, jk, x_norm_model, params)
    rep = AlsReport(
        iters=int(final.iters),
        fit=float(final.fit),
        approx_error=float(final.approx_error),
        converged=bool(final.converged),
    )
    return final.kt, rep


@partial(jax.jit, static_argnames=("params", "n_iters"))
def _run_vmap_als(x, kts: Ktensor, params: AlsParams, n_iters: int) -> SolverState:
    """All models iterate in lock-step until every one converges."""
    x_norm = jnp.linalg.norm(x.ravel())
    state = init_state(
        kts,
        x_norm,
        nnls=params.update_method == UpdateMethod.NNLS,
        line_search=params.line_search,
        mixed_tol=params.tol_check_interval > 0,
    )
    iteration = make_iteration(params, batched=True)
    prepared = iteration.prepare(x)

    def cond(s: SolverState):
        return jnp.logical_not(jnp.all(s.converged))

    def body(s: SolverState):
        new = iteration(x, s, x_norm, prepared)
        # Freeze models that already converged (the reference's OMP baseline
        # runs each model independently; here lock-step + freezing matches
        # each model's trajectory exactly while remaining one fused program).
        from .state import tree_where

        return tree_where(s.converged, s, new)

    return jax.lax.while_loop(cond, body, state)


@jax.jit
def _stack_kts(kts: tuple) -> Ktensor:
    """Stack same-rank models into one [B]-leading Ktensor under ONE jit
    (eager per-leaf jnp.stack compiled ~7 tiny concat/broadcast programs
    and dispatched each separately; module-level so repeat calls hit the
    jit cache)."""
    return jax.tree.map(lambda *fs: jnp.stack(fs), *kts)


def cp_batched_als(
    x: Array, kts: Sequence[Ktensor] | Ktensor, params: AlsParams = AlsParams()
) -> tuple[list[Ktensor], list[AlsReport]]:
    """Fit many same-rank models independently (reference ``cp_omp_als``).

    Each model follows the exact trajectory cp_als would give it (converged
    models are frozen), but all of them share one batched device program.
    """
    if isinstance(kts, Ktensor):
        kt_b = kts
    else:
        kt_b = _stack_kts(tuple(kts))
    final = _run_vmap_als(x, kt_b, params, params.max_iterations)
    b = final.iters.shape[0]
    # Bulk host fetch ONCE: per-model device indexing (`final.fit[i]`) costs
    # a dispatch + fetch round trip EACH (~30-60 ms on tunneled backends),
    # which dominated the batched-ALS baseline's wall at B models x 3 reads.
    import numpy as np

    iters_h = np.asarray(final.iters)
    fit_h = np.asarray(final.fit)
    err_h = np.asarray(final.approx_error)
    conv_h = np.asarray(final.converged)
    kt_h = jax.tree.map(np.asarray, final.kt)
    results, reports = [], []
    for i in range(b):
        results.append(jax.tree.map(lambda a: a[i], kt_h))
        reports.append(
            AlsReport(
                iters=int(iters_h[i]),
                fit=float(fit_h[i]),
                approx_error=float(err_h[i]),
                converged=bool(conv_h[i]),
            )
        )
    return results, reports
