"""End-to-end single-model ALS tests (reference tests/als/test_als.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cp_cals_tpu import AlsParams, LineSearchMethod, UpdateMethod
from cp_cals_tpu.ktensor import random_ktensor, to_tensor, denormalize
from cp_cals_tpu.solvers import cp_als, cp_batched_als


def rank_r_tensor(key, modes, rank, noise=0.0):
    """Low-rank target built from a random Ktensor
    (reference src/tensor.cpp:79-85), optionally with additive noise so the
    error floor stays away from machine zero (cross-implementation
    trajectory comparisons are only stable above the rounding floor)."""
    x = to_tensor(random_ktensor(key, modes, rank))
    if noise:
        kn = jax.random.fold_in(key, 1)
        x = x + noise * jax.random.normal(kn, x.shape, x.dtype)
    return x


@pytest.mark.parametrize("method", ["krp_gemm", "twostep"])
def test_recover_3d(method):
    """All MTTKRP variants drive the same fit to a sane error
    (reference ComputeCorrectResult3D, test_als.cpp:10-60)."""
    from cp_cals_tpu.config import MttkrpMethod

    key = jax.random.PRNGKey(7)
    kx, k0 = jax.random.split(key)
    x = rank_r_tensor(kx, (10, 9, 8), 3)
    kt0 = random_ktensor(k0, (10, 9, 8), 5)
    params = AlsParams(
        max_iterations=200, tol=1e-9, mttkrp_method=MttkrpMethod(method)
    )
    kt, rep = cp_als(x, kt0, params)
    assert rep.converged
    assert rep.approx_error < 1e-4, rep
    # fit is 1 - err/|X|
    x_norm = float(jnp.linalg.norm(x.ravel()))
    np.testing.assert_allclose(rep.fit, 1 - rep.approx_error / x_norm, rtol=1e-10)


def test_variants_identical_trajectory():
    """krp_gemm and twostep give *identical* errors at matched inits
    (reference asserts <=1e-8 pairwise)."""
    from cp_cals_tpu.config import MttkrpMethod

    key = jax.random.PRNGKey(8)
    kx, k0 = jax.random.split(key)
    x = rank_r_tensor(kx, (8, 7, 6), 3)
    kt0 = random_ktensor(k0, (8, 7, 6), 4)
    errs = []
    for m in ["krp_gemm", "twostep"]:
        _, rep = cp_als(x, kt0, AlsParams(tol=1e-9, mttkrp_method=MttkrpMethod(m)))
        errs.append(rep.approx_error)
    assert abs(errs[0] - errs[1]) <= 1e-8


def test_recover_4d():
    """N-D path recovers a rank-5 tensor with a rank-7 model
    (reference ComputeCorrectResult4D, test_als.cpp:105-123, tol < 1e-1)."""
    key = jax.random.PRNGKey(9)
    kx, k0 = jax.random.split(key)
    x = rank_r_tensor(kx, (3, 3, 3, 3), 5)
    kt0 = random_ktensor(k0, (3, 3, 3, 3), 7)
    kt, rep = cp_als(x, kt0, AlsParams(max_iterations=500, tol=1e-10))
    assert rep.approx_error < 1e-1


def test_nnls_nonnegative():
    """NNLS keeps factors >= 0 (reference ComputeCorrectResultConstrained3D,
    test_als.cpp:62-103)."""
    key = jax.random.PRNGKey(10)
    kx, k0 = jax.random.split(key)
    # Non-negative target: square the factors of a random model.
    kt_true = random_ktensor(kx, (8, 7, 6), 3)
    kt_true = jax.tree.map(jnp.abs, kt_true)
    x = to_tensor(kt_true)
    kt0 = random_ktensor(k0, (8, 7, 6), 4)
    params = AlsParams(
        max_iterations=100, tol=1e-8, update_method=UpdateMethod.NNLS
    )
    kt, rep = cp_als(x, kt0, params)
    kd = denormalize(kt)
    for f in kd.factors:
        assert float(jnp.min(f)) >= 0.0
    assert rep.approx_error < 50


def test_line_search_no_error_checking_converges():
    key = jax.random.PRNGKey(11)
    kx, k0 = jax.random.split(key)
    x = rank_r_tensor(kx, (12, 11, 10), 4)
    kt0 = random_ktensor(k0, (12, 11, 10), 4)
    base = AlsParams(max_iterations=500, tol=1e-11)
    ls = AlsParams(max_iterations=500, tol=1e-11, line_search=True)
    _, rep0 = cp_als(x, kt0, base)
    _, rep1 = cp_als(x, kt0, ls)
    assert rep1.approx_error < max(rep0.approx_error * 10, 1e-6)


def test_line_search_error_checking_converges():
    key = jax.random.PRNGKey(12)
    kx, k0 = jax.random.split(key)
    x = rank_r_tensor(kx, (12, 11, 10), 4)
    kt0 = random_ktensor(k0, (12, 11, 10), 4)
    ls = AlsParams(
        max_iterations=500,
        tol=1e-11,
        line_search=True,
        line_search_method=LineSearchMethod.ERROR_CHECKING,
    )
    _, rep1 = cp_als(x, kt0, ls)
    assert rep1.approx_error < 1e-5


def test_batched_als_matches_single():
    """cp_batched_als (the omp-ALS analog) reproduces cp_als exactly per model
    (reference SimpleCorrectness cross-check, tests/cals/test_cals.cpp:13-86)."""
    key = jax.random.PRNGKey(13)
    kx, k0 = jax.random.split(key)
    x = rank_r_tensor(kx, (8, 7, 6), 3, noise=1e-3)
    kts = [random_ktensor(k, (8, 7, 6), 4) for k in jax.random.split(k0, 4)]
    results, reports = cp_batched_als(x, kts, AlsParams(tol=1e-9))
    for kt0, ktb, repb in zip(kts, results, reports):
        kt_s, rep_s = cp_als(x, kt0, AlsParams(tol=1e-9))
        assert rep_s.iters == repb.iters
        np.testing.assert_allclose(
            to_tensor(ktb), to_tensor(kt_s), atol=1e-11
        )


def test_monotonicity_debug_warning():
    """params.debug flags an error increase > 1e-4 (reference warn at
    als.cpp:233-238, assert at cals.cpp:299): feeding an artificially tiny
    previous error must trigger the warning; a normal converging run must
    not."""
    from cp_cals_tpu.solvers.iteration import (
        MONOTONICITY_VIOLATIONS,
        make_iteration,
    )
    from cp_cals_tpu.solvers.state import init_state

    key = jax.random.PRNGKey(21)
    kx, k0 = jax.random.split(key)
    x = rank_r_tensor(kx, (6, 5, 4), 3, noise=1e-3)
    kt0 = random_ktensor(k0, (6, 5, 4), 3)
    x_norm = jnp.linalg.norm(x.ravel())
    params = AlsParams(debug=True)
    iteration = make_iteration(params, batched=False)

    state = init_state(kt0, x_norm)
    state = state._replace(
        iters=jnp.asarray(5, jnp.int32),
        approx_error=jnp.asarray(0.0, x.dtype),
    )
    MONOTONICITY_VIOLATIONS.clear()
    with pytest.warns(UserWarning, match="error increased"):
        out = iteration(x, state, x_norm)
        np.asarray(out.fit)
    assert MONOTONICITY_VIOLATIONS
    it, old_err, new_err = MONOTONICITY_VIOLATIONS[0]
    assert new_err > old_err + 1e-4

    # A regular converging fit must stay monotone (no false positives).
    MONOTONICITY_VIOLATIONS.clear()
    cp_als(x, kt0, AlsParams(debug=True, tol=1e-9))
    assert not MONOTONICITY_VIOLATIONS


def test_external_numpy_oracle_cross_validation():
    """Cross-validate against a fully INDEPENDENT textbook NumPy CP-ALS
    (no shared code, explicit unfold/KRP, pinv solves) — the analog of the
    reference's TensorToolbox comparison (matlab_src/TTB_vs_CALS.m).
    Matched inits + matched iteration counts must give matching
    reconstructions and matching per-mode-normalized trajectories."""
    from external_cp_als import cp_als_numpy, reconstruct

    key = jax.random.PRNGKey(33)
    kx, k0 = jax.random.split(key)
    x = rank_r_tensor(kx, (9, 8, 7), 3, noise=1e-3)
    kt0 = random_ktensor(k0, (9, 8, 7), 4)
    n_iter = 12

    kt_fit, rep = cp_als(
        x, kt0, AlsParams(max_iterations=n_iter, force_max_iter=True)
    )

    f_np, lam_np = cp_als_numpy(
        np.asarray(x),
        [np.asarray(f) for f in kt0.factors],
        np.asarray(kt0.lam),
        n_iter,
    )
    want = reconstruct(f_np, lam_np)
    np.testing.assert_allclose(
        np.asarray(to_tensor(kt_fit)), want, atol=1e-9
    )
    # Factor trajectories match elementwise too (same normalization
    # schedule), not just the product.
    for f_j, f_n in zip(kt_fit.factors, f_np):
        np.testing.assert_allclose(np.asarray(f_j), f_n, atol=1e-8)
