"""High-level user API.

The TPU-native equivalent of the reference's user-facing driver surface
(`/root/reference/matlab/matlab_cp_cals.cpp`, `matlab_cp_cals_jk.cpp`,
`matlab_cp_cals_hybrid.cpp` + the `matlab/matlab_src/*.m` wrappers): the
same three entry points over plain arrays, with 'random' or explicit
initial guesses and keyword options mirroring the reference's option
strings (matlab_parsing.cpp:188-215: update-method, mttkrp-method,
maxiters, buffer-size, tol, ls, ls-interval, ls-step).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    CalsParams,
    LineSearchMethod,
    MttkrpMethod,
    UpdateMethod,
    default_dtype,
)
from .ktensor import Ktensor, random_ktensor
from .solvers import cp_cals as _cp_cals_solver
from .solvers import jk_cp_cals as _jk_solver
from .solvers.jackknife import JKReport


def _make_params(
    *,
    tol=1e-7,
    maxiters=200,
    buffer_size=4200,
    update_method="unconstrained",
    mttkrp_method="auto",
    line_search=False,
    line_search_interval=5,
    line_search_step=0.0,
    line_search_method="no_error_checking",
    force_max_iter=False,
    bucket_ranks=(4, 8, 16, 32),
    # TPU-native extensions (config.py): the fast-MTTKRP tier, the
    # mixed-tier stopping check that makes it tol-safe, full-precision
    # refinement of converged models, and the half-width result wire.
    mttkrp_precision=None,
    tol_check_interval=0,
    polish_iters=0,
    result_wire_dtype=None,
    # Round-5 extensions: polish-to-convergence (statistics-grade fast
    # tier), deferred eviction syncs, and the HBM layout policy.
    polish_tol=0.0,
    evict_batch=1,
    mode_layouts="auto",
    dimtree="auto",
    epilogue="auto",
    solve_method="gj",
) -> CalsParams:
    return CalsParams(
        tol=tol,
        max_iterations=maxiters,
        buffer_size=buffer_size,
        update_method=UpdateMethod(update_method),
        mttkrp_method=MttkrpMethod(mttkrp_method),
        line_search=line_search,
        line_search_interval=line_search_interval,
        line_search_step=line_search_step,
        line_search_method=LineSearchMethod(line_search_method),
        force_max_iter=force_max_iter,
        bucket_ranks=tuple(bucket_ranks),
        mttkrp_precision=mttkrp_precision,
        tol_check_interval=tol_check_interval,
        polish_iters=polish_iters,
        result_wire_dtype=result_wire_dtype,
        polish_tol=polish_tol,
        evict_batch=evict_batch,
        mode_layouts=mode_layouts,
        dimtree=dimtree,
        epilogue=epilogue,
        solve_method=solve_method,
    )


def _init_models(x, ranks, init, dtype, seed):
    if init == "random":
        # Device-generated random initial guesses: the engine materializes
        # specs on the accelerator, so nothing but seeds crosses the
        # host->device link (see ktensor.RandomKtensorSpec). The result is
        # deterministic in (seed, position).
        from .ktensor import RandomKtensorSpec

        return [
            RandomKtensorSpec(
                tuple(x.shape), int(r), seed=seed * 100003 + i,
                dtype=str(jnp.dtype(dtype)),
            )
            for i, r in enumerate(ranks)
        ]
    models = []
    for m in init:
        if isinstance(m, Ktensor):
            models.append(m)
        else:  # (factors, lam) tuple of arrays
            factors, lam = m
            models.append(
                Ktensor(tuple(jnp.asarray(f, dtype) for f in factors),
                        jnp.asarray(lam, dtype))
            )
    return models


@dataclass
class FitResult:
    ktensors: list  # fitted models, input order
    # The initial guesses used: Ktensors as passed, or RandomKtensorSpec
    # entries for init='random' (materialize with ktensor.spec_to_ktensor).
    initial: list
    errors: list = field(default_factory=list)
    iters: list = field(default_factory=list)
    fits: list = field(default_factory=list)


def cp_cals(x, ranks: Sequence[int], init="random", seed: int = 0, **options):
    """Fit one CP model per entry of ``ranks`` concurrently.

    Equivalent of the reference MEX driver `cp_cals`
    (matlab_cp_cals.cpp:90-168). ``init`` is 'random' or a list of Ktensors
    / (factors, lam) tuples matching ``ranks``.
    """
    x = jnp.asarray(x, default_dtype())
    params = _make_params(**options)
    models = _init_models(x, ranks, init, x.dtype, seed)
    fitted, rep = _cp_cals_solver(x, models, params)
    return FitResult(
        ktensors=fitted,
        initial=models,
        errors=[m.approx_error for m in rep.models],
        iters=[m.iters for m in rep.models],
        fits=[m.fit for m in rep.models],
    )


def cp_cals_jk(x, fitted: Sequence[Ktensor], **options) -> JKReport:
    """Jackknife every fitted model (reference matlab_cp_cals_jk.cpp:94-240):
    leave-one-out replicates per mode-0 sample, one concurrent run, rescale +
    LSAP permutation matching."""
    x = jnp.asarray(x, fitted[0].lam.dtype)
    params = _make_params(**options)
    return _jk_solver(x, list(fitted), params)


def cp_cals_hybrid(
    x, ranks: Sequence[int], init="random", seed: int = 0, **options
):
    """Two-phase: fit all requested models, pick the best per distinct rank,
    jackknife only those (reference matlab_cp_cals_hybrid.cpp:159-207)."""
    result = cp_cals(x, ranks, init=init, seed=seed, **options)
    best: dict[int, tuple[float, Ktensor]] = {}
    for kt, err in zip(result.ktensors, result.errors):
        r = kt.rank
        if r not in best or err < best[r][0]:
            best[r] = (err, kt)
    best_models = [kt for _, kt in best.values()]
    jk = cp_cals_jk(x, best_models, **options)
    return result, best_models, jk
