"""One ALS iteration as a pure jitted function over SolverState.

This is the TPU re-design of the reference's twin iteration loops
(`/root/reference/src/als.cpp:150-277` single model,
`/root/reference/src/cals.cpp:174-382` concurrent): instead of an OpenMP
loop over registry entries around BLAS calls, every per-model operation is
batched over the leading model axis and the whole iteration (mode sweep +
error + line search + convergence flags) compiles to one XLA program. The
mode loop is a static Python unroll (shapes differ per mode), so XLA sees a
straight-line program of MXU contractions it can schedule and fuse.

Dead/padded slots are algebraically inert (zero factors, zero lam, identity
normal matrix), so no alive-gating is needed inside the iteration — the
analog of the reference detaching and zeroing vacated buffer columns
(src/multi_ktensor.cpp:132-163).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import (
    AlsParams,
    CalsParams,
    LineSearchMethod,
    UpdateMethod,
    resolve_precision,
)
from ..ktensor import (
    Ktensor,
    denormalize,
    normalize_factor_fused,
    normalize_full,
    scale_jk_rows,
)
from ..ops.error import fast_error, fast_error_from_cols
from ..ops.gramians import gramians, hadamard_all, hadamard_but_one
from ..ops.mttkrp import mttkrp, mttkrp_batched
from ..ops.pallas_epilogue import (
    epilogue_apply_pallas,
    normal_inverse_pallas,
    supports_fused_epilogue,
)
from ..ops.update import (
    padded_hadamard,
    update_factor_nnls,
    update_factor_unconstrained,
)
from .state import BIG_ERROR, HiState, LsState, SolverState, tree_where

Array = jax.Array


def extrapolated_delta(rate: Array, rate_prev: Array, gap: Array) -> Array:
    """Estimate the CURRENT per-iteration fit delta from two consecutive
    window-average rates (mixed-tier stopping, config.tol_check_interval).

    The window-average rate LAGS the instantaneous fit delta: ALS deltas
    decay ~geometrically, so the mean of the last `gap` deltas exceeds the
    newest one and an averaged-rate test stops ~1.4x the fp64 oracle's
    iteration count (measured, convergence_tpu_mixed_k3.json). With
    d_i = d_k * rho^(i-k) the two window averages satisfy
    rate/rate_prev = rho^gap, and the newest delta is

        d_k = rate * gap * (1/rho - 1) / (rho^-gap - 1).

    Used when two positive, decaying window rates are on record; falls
    back to the raw window rate otherwise (first real window, noise, or
    non-decaying rates). rho is clamped >= 0.2 so one noisy pair cannot
    claim a >5x/iteration decay and stop a still-improving model; the
    signed rate itself still stops models whose high-tier fit has stopped
    improving (rate <= 0 passes through as-is).

    Numerics: the closed form rate*gap*(1/rho - 1)/(rho^-gap - 1) overflows
    to inf in f32 once gap is large at the rho=0.2 clamp (5**gap), which
    collapses d_k to 0 — the correct geometric limit, but a single noisy
    pair after a long inter-check gap could then claim full convergence.
    Computed here in the algebraically identical bounded form
    rate*gap*(1-rho)*rho^(gap-1)/(1-rho^gap): rho^gap lives in [0, 1], so
    large gaps UNDERFLOW d_k toward 0 smoothly instead of dividing by inf,
    and the guarded denominator turns an f32-rounded rho~=1 into a
    conservative (large) d_k rather than a spurious stop.
    """
    have2 = (rate_prev > 0) & (rate > 0)
    ratio = jnp.where(have2, rate, 1.0) / jnp.where(have2, rate_prev, 1.0)
    rho = jnp.clip(ratio ** (1.0 / gap), 0.2, 1.0)
    rho_g = rho**gap  # in [0.2^gap, 1]: never overflows
    d_k = (
        rate * gap * (1.0 - rho) * (rho_g / rho)
        / jnp.maximum(1.0 - rho_g, 1e-30)
    )
    return jnp.where(have2 & (rho < 1.0), d_k, rate)


# Debug hook (params.debug): each entry is (iteration, old_error, new_error)
# for one model whose error rose by more than 1e-4 — the TPU-side analog of
# the reference's monotonicity warning (als.cpp:233-238). Inspectable by
# tests and cleared by callers.
MONOTONICITY_VIOLATIONS: list = []


def _record_monotonicity_violation(viol, iters, err, prev_err):
    import warnings

    import numpy as np

    v = np.atleast_1d(np.asarray(viol))
    if not v.any():
        return
    it = np.atleast_1d(np.asarray(iters))
    e = np.atleast_1d(np.asarray(err))
    pe = np.atleast_1d(np.asarray(prev_err))
    for i in np.argwhere(v)[:16]:
        i = tuple(i)
        MONOTONICITY_VIOLATIONS.append(
            (int(it[i]), float(pe[i]), float(e[i]))
        )
    warnings.warn(
        f"approximation error increased for {int(v.sum())} model(s) "
        f"(> 1e-4; reference als.cpp:233-238)",
        stacklevel=2,
    )


def make_iteration(
    params: AlsParams | CalsParams,
    batched: bool,
    mttkrp_methods: tuple[str, ...] | None = None,
    has_jk: bool = True,
) -> Callable[[Array, SolverState, Array], SolverState]:
    """Build the jittable iteration body for the given (static) params.

    mttkrp_methods optionally overrides the contraction strategy per mode
    (resolved from the autotune LUT by the CALS engine when the configured
    method is AUTO — the analog of the reference's per-mode LUT dispatch,
    mttkrp.cpp:575-587).

    has_jk=False compiles out the jackknife row re-zeroing (a full pass
    over the mode-0 factor per iteration) for runs whose queue contains no
    jackknife models — the engine knows this statically at intake.
    """
    precision = resolve_precision(params.precision)
    # MTTKRP-only precision tier (config.mttkrp_precision): the MTTKRP is
    # ~95% of iteration FLOPs and bf16 "default" runs it ~4x faster than
    # "high" on the v5e MXU (docs/PROFILE.md round-3 ablation).
    mttkrp_prec = resolve_precision(
        getattr(params, "mttkrp_precision", None) or params.precision
    )
    nnls = params.update_method == UpdateMethod.NNLS
    default_method = params.mttkrp_method.value
    # Fused Pallas epilogue (solve + normalize + gramian + error columns in
    # VMEM, ops/pallas_epilogue.py): "fused" forces it (interpret mode
    # off-TPU, the test configuration); "auto" and "xla" use the unfused
    # XLA path. Round-5 re-measurement flipped auto's choice: with the
    # MTTKRP at the fast tiers the epilogue is no longer hidden, and the
    # kernel costs 0.65 vs 0.55 ms/iteration (back-to-back bench A/B:
    # 925-987 vs 1505-1516 models/s) — the round-2 "tie" was measured
    # when 3x-slower MTTKRPs dominated the iteration. The kernels remain
    # validated and selectable.
    epilogue = getattr(params, "epilogue", "auto")
    on_tpu = jax.default_backend() == "tpu"
    want_fused = batched and not nnls and epilogue == "fused"
    fused_interpret = not on_tpu

    def resolve_methods(x) -> tuple[str, ...]:
        if mttkrp_methods is not None:
            return mttkrp_methods
        if default_method == "auto":
            from ..utils.lut import heuristic_methods

            return heuristic_methods(x.shape)
        return tuple(default_method for _ in range(x.ndim))

    layout_policy = getattr(params, "mode_layouts", "auto")
    # Dimension-tree sweep (config.dimtree, 3-D only): modes 1/2 derive
    # from one shared X x_0 A TTM computed after the mode-0 update.
    # "auto": on for non-bf16 MTTKRP tiers (measured 0.76-0.82x per
    # iteration), off at the 1-pass-bf16 tier (the f32-stored shared T
    # doubles traffic there, 1.09x — config.py).
    dimtree_cfg = getattr(params, "dimtree", "auto")
    if dimtree_cfg in (True, "on"):
        dimtree = True
    elif dimtree_cfg in (False, "off"):
        dimtree = False
    elif dimtree_cfg == "auto":
        dimtree = mttkrp_prec != jax.lax.Precision.DEFAULT
    else:
        raise ValueError(
            f"dimtree={dimtree_cfg!r}: expected 'auto', 'on', or 'off'"
        )

    def resolve_layout_policy(x) -> str:
        """"auto": recompute layouts in-loop for tensors > 128 MB (the
        measured crossover band, config.mode_layouts), else materialize."""
        if layout_policy != "auto":
            return layout_policy
        big = x.size * jnp.dtype(x.dtype).itemsize > 128 * 1024 * 1024
        return "recompute" if big else "materialized"

    def prepare(x):
        """Loop-invariant tensor layouts; compute once per solve, outside
        the iteration loop. Under mode_layouts="recompute" nothing is
        prepared — layouts are derived inside the loop (config.py)."""
        from ..ops.mttkrp import dimtree_layout, prepare_batched

        if not batched or resolve_layout_policy(x) == "recompute":
            return None
        per_mode = prepare_batched(x, resolve_methods(x))
        if dimtree and x.ndim == 3:
            # One extra slot past the per-mode layouts: the shared-TTM
            # layout [I1*I2, I0] (indexed as prepared[n_modes]).
            return per_mode + (dimtree_layout(x),)
        return per_mode

    def do_mttkrp(x, factors, n, prepared):
        method = resolve_methods(x)[n]
        if batched:
            return mttkrp_batched(
                x, factors, n, method, mttkrp_prec,
                prepared[n] if prepared is not None else None,
            )
        return mttkrp(x, factors, n, method, mttkrp_prec)

    # Mixed-tier stopping (config.tol_check_interval): periodic stopping
    # checks run one extra last-mode MTTKRP at FULL `precision`.
    mixed_check = getattr(params, "tol_check_interval", 0) > 0

    def do_mttkrp_hi(x, factors, n, prepared):
        method = resolve_methods(x)[n]
        if batched:
            return mttkrp_batched(
                x, factors, n, method, precision,
                prepared[n] if prepared is not None else None,
            )
        return mttkrp(x, factors, n, method, precision)

    def iteration(
        x: Array, state: SolverState, x_norm_full: Array, prepared=None
    ) -> SolverState:
        n_modes = x.ndim
        iters = state.iters + 1
        if batched and resolve_layout_policy(x) == "recompute":
            # Tie the tensor to a loop-carried value so the per-mode
            # layout transposes CANNOT be hoisted out of the while_loop
            # (XLA's LICM would otherwise rematerialize all N layouts
            # ahead of the loop, defeating the policy): each iteration
            # re-derives and frees them, peak residency ~X + 1 layout.
            x = jax.lax.optimization_barrier((x, iters))[0]
        kt, grams, active, ls = state.kt, state.grams, state.active, state.ls

        # Line-search snapshot of the previous model state, taken before the
        # mode sweep when the counter is one short of the interval
        # (reference als.cpp:158-160, cals.cpp:203-211).
        if params.line_search:
            snap = ls.it == (params.line_search_interval - 1)
            ls = ls._replace(prev=tree_where(snap, kt, ls.prev))

        # ------------------------------------------------------ mode sweep
        g_last = None
        t3_last = None
        dt_shared = None
        use_dimtree = dimtree and n_modes == 3
        for n in range(n_modes):
            if use_dimtree and n >= 1:
                from ..ops.mttkrp import dimtree_ttm, dimtree_ttv

                if dt_shared is None:
                    f0 = kt.factors[0]  # post-update (and post-JK-zero)
                    dt_shared = dimtree_ttm(
                        x,
                        f0 if batched else f0[None],
                        mttkrp_prec,
                        prepared[n_modes] if prepared is not None else None,
                    )
                fs = kt.factors if batched else tuple(
                    f[None] for f in kt.factors
                )
                g = dimtree_ttv(dt_shared, fs, n, mttkrp_prec)
                if not batched:
                    g = g[0]
            else:
                g = do_mttkrp(x, kt.factors, n, prepared)
            if n == n_modes - 1:
                g_last = g  # saved for the fast-error formula (als.cpp:174-179)
            use_fused = want_fused and supports_fused_epilogue(
                g.shape[0], g.shape[1], g.shape[2], g.dtype, n_modes
            )
            if use_fused:
                # Fused Pallas epilogue: hadamard+inverse lane-batched, then
                # apply + JK zero + normalize + gramian (+ error columns on
                # the last mode) per model block, all in VMEM.
                hinv = normal_inverse_pallas(
                    grams, state.rank_mask, n, interpret=fused_interpret
                )
                f_new, lam_new, gm_raw, t3 = epilogue_apply_pallas(
                    g, hinv, iters, state.jk_fiber,
                    zero_jk=(n == 0 and has_jk),
                    with_err=(n == n_modes - 1),
                    precision=precision,
                    interpret=fused_interpret,
                )
                if t3 is not None:
                    t3_last = t3
                safe = jnp.where(lam_new != 0, lam_new, 1.0)
                gm = gm_raw / (safe[..., :, None] * safe[..., None, :])
            else:
                h = padded_hadamard(
                    hadamard_but_one(grams, n), state.rank_mask
                )
                if nnls:
                    u, act_n = update_factor_nnls(
                        g, h, active[n], params.nnls_max_outer,
                        params.nnls_algorithm,
                    )
                    active = active[:n] + (act_n,) + active[n + 1 :]
                else:
                    u = update_factor_unconstrained(
                        g, h, solve=params.solve_method
                    )
                if n == 0 and has_jk:
                    # Jackknife: re-zero the left-out sample's row after
                    # every mode-0 update (reference cals.cpp:250-251).
                    # Mode-0 JK only, as the reference's drivers use.
                    u = scale_jk_rows(u, state.jk_fiber, 0.0)
                # Fused normalize + gramian (normalize_mode semantics; L2
                # norms from the gramian diagonal, normalized gramian by
                # rescale).
                f_new, lam_new, gm = normalize_factor_fused(
                    u, iters, precision
                )
            kt = Ktensor(
                kt.factors[:n] + (f_new,) + kt.factors[n + 1 :], lam_new
            )
            grams = grams[:n] + (gm,) + grams[n + 1 :]

        # ------------------------------------------------------ fast error
        if t3_last is not None:
            err = fast_error_from_cols(
                state.x_norm_model, kt.lam, t3_last[0], t3_last[1],
                hadamard_all(grams),
            )
        else:
            err = fast_error(
                state.x_norm_model, kt.lam, kt.factors[-1], g_last,
                hadamard_all(grams),
            )
        old_fit = state.fit
        # Fit always uses the FULL tensor norm, even for jackknife models
        # whose error uses the leave-one-out norm (reference cals.cpp:295-301).
        fit = 1.0 - jnp.abs(err) / x_norm_full

        if params.debug:
            # Error-monotonicity oracle (reference warns on increase > 1e-4,
            # als.cpp:233-238; hard assert in CALS, cals.cpp:299). First
            # iteration excluded (undefined initial error). NEC-extrapolated
            # models carry BIG_ERROR from the previous iteration, which can
            # only make the diff large-positive — no false trigger.
            viol = (
                (iters > 1)
                & state.alive
                & ((state.approx_error - err) < -1e-4)
            )
            jax.debug.callback(
                _record_monotonicity_violation,
                viol, iters, err, state.approx_error,
            )

        # ------------------------------------------------------ line search
        if params.line_search:
            kt, grams, err, fit, old_fit, iters, ls, active = _line_search(
                x, kt, grams, err, fit, old_fit, iters, ls, params, precision,
                x_norm_full, state.x_norm_model, active,
                # Candidate evaluation reuses the tuned per-mode MTTKRP and
                # the prepared (loop-invariant) tensor layout.
                mttkrp_last=lambda factors: do_mttkrp(
                    x, factors, n_modes - 1, prepared
                ),
            )

        # ------------------------------------------------------ convergence
        hi = state.hi
        if params.force_max_iter:
            converged = iters >= params.max_iterations
        elif mixed_check:
            # Mixed-tier stopping (config.tol_check_interval = K): checks
            # run in ADJACENT PAIRS — at engine iterations mK-1 (pre-check)
            # and mK (decision check) — each running one extra last-mode
            # MTTKRP at full `precision`. The decision check then holds the
            # EXACT single-iteration high-tier fit delta (the reference's
            # |fit - old_fit| criterion, als.cpp:273-276, evaluated at the
            # high tier), so no window-average lag or decay extrapolation
            # enters the stopping rule on the common path. Off-check
            # iterations pay nothing (lax.cond) and can only stop on
            # max_iterations. Cost: 2 high-tier MTTKRPs per K iterations
            # (vs 1 for the round-4 window scheme, which overshot the
            # oracle's iteration count 1.41x — VERDICT r4 #3). The batch
            # check is gated on the oldest LIVE model's count so it fires
            # on a fixed engine cadence regardless of per-slot refill phase
            # (per-model gating would fire nearly every iteration in a
            # staggered bucket).
            live = state.alive & jnp.logical_not(state.converged)
            oldest = jnp.max(jnp.where(live, iters, 0))
            k_int = params.tol_check_interval
            phase = oldest % k_int
            at_check = (phase == 0) | (phase == k_int - 1)
            # An extrapolated-but-unvalidated model (NEC line search sets
            # updated_last; the revert decision lands NEXT iteration) must
            # not stop: fit_hi would read the blind candidate's factors,
            # and a regressed candidate gives rate < 0 < tol — evicting
            # factors the revert would have rolled back (ADVICE r4).
            if params.line_search and params.line_search_method == (
                LineSearchMethod.NO_ERROR_CHECKING
            ):
                not_pending = jnp.logical_not(ls.updated_last)
            else:
                not_pending = True

            def do_check(kt, grams, hi, err, fit):
                g_hi = do_mttkrp_hi(x, kt.factors, n_modes - 1, prepared)
                err_hi = fast_error(
                    state.x_norm_model, kt.lam, kt.factors[-1], g_hi,
                    hadamard_all(grams),
                )
                fit_hi = 1.0 - jnp.abs(err_hi) / x_norm_full
                gap = jnp.maximum(iters - hi.iters_prev, 1).astype(fit_hi.dtype)
                # SIGNED improvement rate: on a clean (monotone) ALS fit
                # sequence this equals the reference's |fit - old_fit|
                # criterion; at the fast tier's noise floor the high-tier
                # fit stops improving and jitters, and a signed test stops
                # there instead of wandering until max_iterations (an
                # absolute test can stay above tol forever on jitter).
                rate = (fit_hi - hi.fit_prev) / gap
                seen = hi.iters_prev > 0  # needs one prior check on record
                gap_i = jnp.maximum(iters - hi.iters_prev, 1)
                # Decision checks (previous check = the adjacent pre-check,
                # gap 1): `rate` IS the exact high-tier delta. Non-adjacent
                # windows (phase-shifted refills, max_iterations-capped
                # evictions at odd phases) fall back to the decay
                # extrapolation, which needs EQUAL window lengths (rho^gap
                # = rate/rate_prev) — feed rate_prev=0 otherwise so it
                # degrades to the raw window rate.
                rp = jnp.where(
                    gap_i == hi.gap_prev, hi.rate_prev,
                    jnp.zeros_like(hi.rate_prev),
                )
                d_k = jnp.where(
                    gap_i == 1, rate, extrapolated_delta(rate, rp, gap)
                )
                conv = seen & (d_k < params.tol) & not_pending
                # Record the window rate only once the window is REAL (the
                # first check's "rate" is fit/K against the zero init, not
                # a fit delta — extrapolating from it would claim a bogus
                # huge decay at the second check).
                hi2 = HiState(
                    fit_prev=fit_hi,
                    iters_prev=iters,
                    rate_prev=jnp.where(seen, rate, jnp.zeros_like(rate)),
                    gap_prev=jnp.where(
                        seen, gap_i, jnp.zeros_like(gap_i)
                    ),
                )
                # The checked fit/error replace the noisy fast-tier values
                # (reports and eviction stats read these).
                return conv, hi2, err_hi, fit_hi

            conv_hi, hi, err, fit = jax.lax.cond(
                at_check,
                do_check,
                lambda kt, grams, hi, err, fit: (
                    jnp.zeros_like(state.converged), hi, err, fit
                ),
                kt, grams, hi, err, fit,
            )
            converged = conv_hi | (iters >= params.max_iterations)
        else:
            converged = (jnp.abs(fit - old_fit) < params.tol) | (
                iters >= params.max_iterations
            )

        return SolverState(
            kt=kt,
            grams=grams,
            rank_mask=state.rank_mask,
            iters=iters,
            fit=fit,
            old_fit=old_fit,
            approx_error=err,
            converged=converged,
            alive=state.alive,
            jk_fiber=state.jk_fiber,
            x_norm_model=state.x_norm_model,
            active=active,
            ls=ls,
            hi=hi,
        )

    iteration.prepare = prepare
    return iteration


def _line_search(
    x, kt, grams, err, fit, old_fit, iters, ls: LsState, params, precision,
    x_norm_full, x_norm_model, active=(), mttkrp_last=None,
):
    """Masked batched line search (reference line_search.cpp:228-283).

    Both methods extrapolate ``U <- U + step * (U - U_prev)`` every
    ``interval`` iterations with step = cbrt(iteration) by default
    (als.cpp:252-253). NO_ERROR_CHECKING extrapolates blindly, keeps a backup
    and reverts next iteration if the error rose; ERROR_CHECKING computes the
    exact reconstruction error of the extrapolated model and accepts only on
    improvement.
    """
    interval = params.line_search_interval
    if params.line_search_step == 0:
        step = jnp.cbrt(iters.astype(err.dtype))
    else:
        step = jnp.full_like(err, params.line_search_step)

    nec = params.line_search_method == LineSearchMethod.NO_ERROR_CHECKING
    if nec:
        # Skip entirely when the model is about to be evicted unchecked
        # (als.cpp:248-251, cals.cpp:317-319).
        do_ls = iters < params.max_iterations
    else:
        do_ls = jnp.ones_like(iters, bool)

    it2 = jnp.where(do_ls, ls.it + 1, ls.it)

    if nec:
        # Revert phase: if we extrapolated last iteration and the error rose,
        # restore the backup (line_search.cpp:236-263).
        was_upd = ls.updated_last & do_ls
        revert = was_upd & (ls.backup_err < err)
        kt = tree_where(revert, ls.backup, kt)
        # NNLS warm-start active sets revert with the factors (reference
        # Ktensor::copy restores active_set, ktensor.cpp:163-181) — a
        # rejected extrapolation must not leave its active sets behind.
        active = tree_where(revert, ls.backup_active, active)
        err = jnp.where(revert, ls.backup_err, err)
        fit = jnp.where(revert, ls.backup_fit, fit)
        old_fit = jnp.where(revert, ls.backup_old_fit, old_fit)
        iters = jnp.where(revert, ls.backup_iters, iters)
        it2 = jnp.where(revert, 0, it2)
        updated_last = ls.updated_last & jnp.logical_not(do_ls)

        # Extrapolation phase (line_search.cpp:24-71).
        extrap = (it2 == interval) & do_ls
        it2 = jnp.where(extrap, 0, it2)
        updated_last = jnp.where(extrap, True, updated_last)
        backup = tree_where(extrap, kt, ls.backup)
        backup_active = tree_where(extrap, active, ls.backup_active)
        backup_err = jnp.where(extrap, err, ls.backup_err)
        backup_fit = jnp.where(extrap, fit, ls.backup_fit)
        backup_old_fit = jnp.where(extrap, old_fit, ls.backup_old_fit)
        backup_iters = jnp.where(extrap, iters, ls.backup_iters)

        kt_d = denormalize(kt)
        prev_d = denormalize(ls.prev)
        s = step[..., None, None]
        ext = Ktensor(
            tuple(f + s * (f - pf) for f, pf in zip(kt_d.factors, prev_d.factors)),
            jnp.ones_like(kt.lam),
        )
        ext = normalize_full(ext)
        kt = tree_where(extrap, ext, kt)
        err = jnp.where(extrap, jnp.asarray(BIG_ERROR, err.dtype), err)
        old_fit = jnp.where(extrap, fit, old_fit)
        fit = jnp.where(extrap, 1.0 - BIG_ERROR, fit)

        # Gramians refreshed for reverted/extrapolated models
        # (line_search.cpp:58, :266) — skipped entirely on iterations where
        # no model was touched (the common case between intervals).
        touched = revert | extrap
        grams = jax.lax.cond(
            jnp.any(touched),
            lambda kt_, g_: tree_where(
                touched, gramians(kt_.factors, precision), g_
            ),
            lambda kt_, g_: g_,
            kt, grams,
        )
        ls = LsState(
            it=it2,
            updated_last=updated_last,
            prev=ls.prev,
            backup=backup,
            backup_err=backup_err,
            backup_fit=backup_fit,
            backup_old_fit=backup_old_fit,
            backup_iters=backup_iters,
            backup_active=backup_active,
        )
        return kt, grams, err, fit, old_fit, iters, ls, active

    # ERROR_CHECKING: extrapolate raw factors (lam carried over), measure the
    # exact error, accept only on improvement (line_search.cpp:86-153).
    # The whole candidate evaluation — including its MTTKRP-sized exact
    # error — runs only on iterations where some model hits the interval
    # (the reference computes it only at the interval too); off-interval
    # iterations pay nothing.
    extrap = it2 == interval
    it2 = jnp.where(extrap, 0, it2)
    s = step[..., None, None]

    def try_extrapolate(kt, grams, err, fit, old_fit):
        cand = Ktensor(
            tuple(
                f + s * (f - pf)
                for f, pf in zip(kt.factors, ls.prev.factors)
            ),
            kt.lam,
        )
        cand_norm = normalize_full(denormalize(cand))
        # Exact error vs the model's OWN target norm: jackknife models'
        # error is the leave-one-out error (their factor-0 jk row is zero,
        # so <X, X_hat> equals the LOO inner product and the LOO norm makes
        # the expansion exact) — matches the current `err` being compared
        # against (reference cals.cpp:295-301 + line_search.cpp:86-153).
        new_err = _exact_error(
            x, cand_norm, x_norm_model, precision, mttkrp_last
        )
        accept = extrap & (new_err < err)
        kt2 = tree_where(accept, cand_norm, kt)
        grams2 = tree_where(accept, gramians(kt2.factors, precision), grams)
        old_fit2 = jnp.where(accept, fit, old_fit)
        err2 = jnp.where(accept, new_err, err)
        # fit recomputed with the full tensor norm, as the reference's
        # calculate_new_fit(X_norm) does (line_search.cpp:141-142).
        fit2 = jnp.where(accept, 1.0 - jnp.abs(new_err) / x_norm_full, fit)
        return kt2, grams2, err2, fit2, old_fit2

    kt, grams, err, fit, old_fit = jax.lax.cond(
        jnp.any(extrap),
        try_extrapolate,
        lambda kt, grams, err, fit, old_fit: (kt, grams, err, fit, old_fit),
        kt, grams, err, fit, old_fit,
    )
    ls = ls._replace(it=it2)
    # ERROR_CHECKING keeps the NNLS active sets as-is on accept (the
    # reference's accepted candidate carries the pre-extrapolation sets).
    return kt, grams, err, fit, old_fit, iters, ls, active


def _exact_error(x, kt: Ktensor, x_norm, precision, mttkrp_last=None) -> Array:
    """Exact |X - full(kt)| per model WITHOUT reconstructing the tensor.

    ``x_norm`` is the per-model target norm — the full-tensor norm for
    regular models, the leave-one-out norm for jackknife models (whose
    factor-0 jk row is zero, making the expansion below exact for the LOO
    tensor).

    The reference materializes the reconstruction per candidate
    (error.cpp:7-62); batched on TPU that would be a [B, |X|] intermediate.
    Instead use the expansion |X - X_hat|^2 = |X|^2 - 2<X, X_hat> + |X_hat|^2
    where <X, X_hat> = sum_r lam_r <mttkrp(X, N)[:, r], U_N[:, r]> (one extra
    MTTKRP) and |X_hat|^2 = lam^T (hadamard of gramians) lam — the same
    quantities the FastALS formula uses, computed fresh for the candidate,
    which makes this exact rather than an approximation.
    """
    from ..ops.mttkrp import mttkrp_batched

    last = x.ndim - 1
    batched = kt.lam.ndim > 1
    if mttkrp_last is not None:
        # Caller-supplied tuned path (per-mode autotuned method + prepared
        # loop-invariant layout) — avoids materializing a Khatri-Rao
        # product when the tuner rejected krp_gemm for this tensor.
        g_last = mttkrp_last(kt.factors)
    elif batched:
        g_last = mttkrp_batched(x, kt.factors, last, "krp_gemm", precision)
    else:
        from ..ops.mttkrp import mttkrp

        g_last = mttkrp(x, kt.factors, last, "krp_gemm", precision)
    grams = gramians(kt.factors, precision)
    return fast_error(
        x_norm, kt.lam, kt.factors[last], g_last, hadamard_all(grams)
    )
