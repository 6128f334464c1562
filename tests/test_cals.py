"""Concurrent-engine equivalence tests (reference tests/cals/test_cals.cpp).

The strongest invariant in the reference suite: concurrency must be
invisible — CALS results must match sequential ALS results at matched
initial guesses to ~1e-11 (test_cals.cpp:7,13-86). Here that covers rank
padding, slot packing, eviction and refill.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cp_cals_tpu import AlsParams, CalsParams, UpdateMethod
from cp_cals_tpu.ktensor import random_ktensor, to_tensor
from cp_cals_tpu.solvers import cp_als, cp_cals

TOL = 1e-11
MODES = (9, 8, 7)


def make_problem(seed, n_models=12, ranks=(1, 2, 3, 4, 5, 6), noise=1e-3):
    key = jax.random.PRNGKey(seed)
    kx, kk, kn = jax.random.split(key, 3)
    x = to_tensor(random_ktensor(kx, MODES, 3))
    # Noise keeps the error floor away from machine zero, where convergence
    # timing would depend on reduction-order rounding (see test_als.py).
    x = x + noise * jax.random.normal(kn, x.shape, x.dtype)
    keys = jax.random.split(kk, n_models)
    kts = [
        random_ktensor(keys[i], MODES, ranks[i % len(ranks)])
        for i in range(n_models)
    ]
    return x, kts


def test_cals_equals_als_simple():
    """Mixed ranks, small buffer (forces eviction + refill)."""
    x, kts = make_problem(0)
    params = CalsParams(tol=1e-9, buffer_size=12, bucket_ranks=(2, 4, 8))
    results, rep = cp_cals(x, kts, params)
    assert rep.n_ktensors == len(kts)
    for kt0, kt_cals, mrep in zip(kts, results, rep.models):
        kt_als, rep_als = cp_als(x, kt0, AlsParams(tol=1e-9))
        assert rep_als.iters == mrep.iters, (rep_als.iters, mrep.iters)
        np.testing.assert_allclose(
            to_tensor(kt_cals), to_tensor(kt_als), atol=TOL
        )
        np.testing.assert_allclose(mrep.approx_error, rep_als.approx_error, atol=TOL)


def test_cals_single_bucket_large_buffer():
    x, kts = make_problem(1, n_models=6, ranks=(3, 5))
    params = CalsParams(tol=1e-8, buffer_size=4200, bucket_ranks=(8,))
    results, rep = cp_cals(x, kts, params)
    for kt0, kt_cals in zip(kts, results):
        kt_als, _ = cp_als(x, kt0, AlsParams(tol=1e-8))
        np.testing.assert_allclose(
            to_tensor(kt_cals), to_tensor(kt_als), atol=TOL
        )


def test_cals_line_search_equals_als():
    """LineSearchCorrectness analog (test_cals.cpp:88-179)."""
    x, kts = make_problem(2, n_models=6, ranks=(3, 4))
    cp = CalsParams(tol=1e-9, buffer_size=8, bucket_ranks=(4,), line_search=True)
    ap = AlsParams(tol=1e-9, line_search=True)
    results, rep = cp_cals(x, kts, cp)
    for kt0, kt_cals, mrep in zip(kts, results, rep.models):
        kt_als, rep_als = cp_als(x, kt0, ap)
        assert rep_als.iters == mrep.iters
        np.testing.assert_allclose(
            to_tensor(kt_cals), to_tensor(kt_als), atol=TOL
        )


def test_cals_nnls_equals_als():
    x, kts = make_problem(3, n_models=4, ranks=(3,))
    # Non-negative target
    key = jax.random.PRNGKey(99)
    kt_true = jax.tree.map(jnp.abs, random_ktensor(key, MODES, 3))
    x = to_tensor(kt_true)
    cp = CalsParams(
        tol=1e-8, buffer_size=6, bucket_ranks=(4,),
        update_method=UpdateMethod.NNLS,
    )
    ap = AlsParams(tol=1e-8, update_method=UpdateMethod.NNLS)
    results, rep = cp_cals(x, kts, cp)
    for kt0, kt_cals in zip(kts, results):
        kt_als, _ = cp_als(x, kt0, ap)
        np.testing.assert_allclose(
            to_tensor(kt_cals), to_tensor(kt_als), atol=1e-9
        )


def test_cals_nnls_line_search_equals_als():
    """NNLS + NEC line search: the revert must restore the warm-start
    active sets along with the factors (reference Ktensor::copy carries
    active_set, ktensor.cpp:163-181); CALS ≡ ALS through eviction/refill
    with both features on, and factors stay non-negative."""
    _, kts = make_problem(5, n_models=4, ranks=(3,))
    key = jax.random.PRNGKey(77)
    kt_true = jax.tree.map(jnp.abs, random_ktensor(key, MODES, 3))
    x = to_tensor(kt_true)
    cp = CalsParams(
        tol=1e-9, buffer_size=6, bucket_ranks=(4,),
        update_method=UpdateMethod.NNLS, line_search=True,
    )
    ap = AlsParams(
        tol=1e-9, update_method=UpdateMethod.NNLS, line_search=True,
    )
    results, rep = cp_cals(x, kts, cp)
    for kt0, kt_cals, mrep in zip(kts, results, rep.models):
        kt_als, rep_als = cp_als(x, kt0, ap)
        assert rep_als.iters == mrep.iters
        for f in kt_cals.factors:
            assert np.asarray(f).min() >= 0.0
        np.testing.assert_allclose(
            to_tensor(kt_cals), to_tensor(kt_als), atol=1e-9
        )


def test_cals_force_max_iter():
    x, kts = make_problem(4, n_models=3, ranks=(3,))
    params = CalsParams(max_iterations=7, force_max_iter=True, bucket_ranks=(4,))
    results, rep = cp_cals(x, kts, params)
    for m in rep.models:
        assert m.iters == 7


def test_polish_iters_refines_converged_models():
    """Mixed-precision refinement (CalsParams.polish_iters): converged
    models get extra full-precision sweeps fused into the run-until-evict
    program. Reported iteration counts must be unchanged (polish is
    refinement, not ALS progress) and the extra sweeps can only improve
    the returned factors' fit."""
    x, kts = make_problem(6, n_models=6, ranks=(2, 3, 4))
    base = CalsParams(
        tol=1e-7, max_iterations=40, bucket_ranks=(2, 4), buffer_size=12,
        sync_mode="evict",
    )
    import dataclasses

    polished = dataclasses.replace(base, polish_iters=2)
    res0, rep0 = cp_cals(x, kts, base)
    res1, rep1 = cp_cals(x, kts, polished)
    x_norm = float(jnp.linalg.norm(x))
    for m0, m1 in zip(rep0.models, rep1.models):
        assert m0.id == m1.id and m0.iters == m1.iters
    for k0, k1 in zip(res0, res1):
        f0 = 1.0 - float(jnp.linalg.norm(x - to_tensor(k0))) / x_norm
        f1 = 1.0 - float(jnp.linalg.norm(x - to_tensor(k1))) / x_norm
        # Two extra ALS sweeps are monotone in fit (up to roundoff).
        assert f1 >= f0 - 1e-9


def test_always_evict_first_and_trace():
    """Defrag-stress knob (reference experiments_letter.cpp:33-51) + the
    per-iteration trace recorder."""
    from cp_cals_tpu.utils.timers import RunTrace

    x, kts = make_problem(5, n_models=5, ranks=(3,))
    params = CalsParams(
        max_iterations=50, always_evict_first=True, bucket_ranks=(4,),
        buffer_size=8, sync_mode="iter",
    )
    trace = RunTrace()
    results, rep = cp_cals(x, kts, params, trace=trace)
    assert len(results) == 5
    assert len(trace.records) >= 5
    assert trace.records[0].active_columns > 0


def test_exact_error_identity():
    """_exact_error == explicit reconstruction error (fp64 oracle)."""
    import jax.numpy as jnp
    from cp_cals_tpu.ktensor import to_tensor as tt, denormalize
    from cp_cals_tpu.solvers.iteration import _exact_error

    key = jax.random.PRNGKey(11)
    kx, kk = jax.random.split(key)
    x = to_tensor(random_ktensor(kx, MODES, 3))
    kt = random_ktensor(kk, MODES, 4)
    x_norm = jnp.linalg.norm(x.ravel())
    got = _exact_error(x, kt, x_norm, jax.lax.Precision.HIGHEST)
    want = jnp.linalg.norm((x - tt(kt)).ravel())
    np.testing.assert_allclose(float(got), float(want), rtol=1e-9)


def test_empty_queue_and_bad_tensor():
    x, kts = make_problem(6, n_models=1)
    results, rep = cp_cals(x, [], CalsParams())
    assert results == [] and rep.n_ktensors == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 3 modes"):
        cp_cals(jnp.ones((4, 5)), kts, CalsParams())
    # Shape-mismatched models get a clear message, not a broadcast error.
    with _pytest.raises(ValueError, match="do not match tensor shape"):
        cp_cals(jnp.ones((4, 5, 6)), kts, CalsParams())
    from cp_cals_tpu.ktensor import RandomKtensorSpec

    with _pytest.raises(ValueError, match="spec modes"):
        cp_cals(
            jnp.ones((4, 5, 6)),
            [RandomKtensorSpec((4, 5, 7), 2, seed=0)],
            CalsParams(),
        )


def test_engine_checkpointing(tmp_path):
    """cp_cals snapshots bucket state after each eviction round."""
    import os

    x, kts = make_problem(7, n_models=4, ranks=(3,))
    params = CalsParams(max_iterations=6, force_max_iter=True, bucket_ranks=(4,))
    results, rep = cp_cals(x, kts, params, checkpoint_dir=str(tmp_path))
    files = os.listdir(tmp_path)
    assert any(f.startswith("bucket_r4") and f.endswith(".npz") for f in files)
    import json

    meta = json.load(open(tmp_path / "bucket_r4.meta.json"))["meta"]
    assert meta["bucket_rank"] == 4


def test_allocate_bucket_batches():
    """The global column budget (reference include/cals.h:151): aggregate
    allocated padded columns stay <= buffer_size, split across buckets."""
    from cp_cals_tpu.solvers.cals import allocate_bucket_batches

    # EEM-bench-like demand: one wave, budget respected, every bucket served.
    waves = allocate_bucket_batches(
        {4: 80, 8: 80, 12: 80, 16: 80, 20: 80}, 4200
    )
    assert len(waves) == 1
    assert set(waves[0]) == {4, 8, 12, 16, 20}
    assert sum(b * r for r, b in waves[0].items()) <= 4200
    assert all(b >= 1 for b in waves[0].values())

    # Plenty of budget: every bucket gets its full (quantized) demand.
    waves = allocate_bucket_batches({4: 6, 8: 3}, 4200)
    assert waves == [{4: 8, 8: 4}]

    # A single model wider than the budget is still admitted (alone).
    assert allocate_bucket_batches({64: 1}, 16) == [{64: 1}]

    # Budget too small for one slot per bucket -> sequential waves, each
    # within budget.
    waves = allocate_bucket_batches({2: 2, 4: 2}, 4)
    assert len(waves) == 2
    for w in waves:
        assert sum(b * r for r, b in w.items()) <= 4


def test_cals_waves_tiny_budget_equals_als():
    """Engine correctness when the budget forces sequential bucket waves."""
    x, kts = make_problem(9, n_models=8, ranks=(1, 2, 3, 4))
    params = CalsParams(tol=1e-9, buffer_size=6, bucket_ranks=(2, 4))
    results, rep = cp_cals(x, kts, params)
    for kt0, kt_cals, mrep in zip(kts, results, rep.models):
        kt_als, rep_als = cp_als(x, kt0, AlsParams(tol=1e-9))
        assert rep_als.iters == mrep.iters
        np.testing.assert_allclose(
            to_tensor(kt_cals), to_tensor(kt_als), atol=TOL
        )


def test_checkpoint_resume(tmp_path):
    """Kill-and-resume: an interrupted checkpointed run, resumed, must
    reproduce the uninterrupted run exactly (completed models come from the
    done archive, in-flight models continue mid-solve, the rest refit)."""
    x, kts = make_problem(8, n_models=10, ranks=(2, 3))
    params = CalsParams(tol=1e-9, buffer_size=16, bucket_ranks=(4,))
    want, rep_w = cp_cals(x, kts, params)

    part, _ = cp_cals(
        x, kts, params, checkpoint_dir=str(tmp_path), max_rounds_per_bucket=1
    )
    assert any(k is None for k in part), "run should have been interrupted"
    done_before = sum(k is not None for k in part)
    assert done_before >= 1

    got, rep_g = cp_cals(
        x, kts, params, checkpoint_dir=str(tmp_path), resume=True
    )
    assert all(k is not None for k in got)
    for a, b in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(to_tensor(a)), np.asarray(to_tensor(b)), atol=TOL
        )
    for ma, mb in zip(rep_w.models, rep_g.models):
        assert (ma.id, ma.rank, ma.iters) == (mb.id, mb.rank, mb.iters)
        np.testing.assert_allclose(ma.approx_error, mb.approx_error, atol=TOL)


def test_trace_in_evict_threaded_config():
    """Per-iteration trace must work in the PRODUCTION configuration
    (sync_mode='evict' + threaded buckets): counters are recorded
    device-side inside the run-until-evict loop."""
    from cp_cals_tpu.utils.timers import RunTrace

    x, kts = make_problem(10, n_models=8, ranks=(2, 3))
    params = CalsParams(
        tol=1e-9, buffer_size=16, bucket_ranks=(2, 4),
        sync_mode="evict", bucket_threads=4,
    )
    trace = RunTrace()
    results, rep = cp_cals(x, kts, params, trace=trace)
    assert trace.records, "trace must be populated in evict/threaded mode"
    assert len(trace.records) == sum(rep.engine_iterations.values())
    assert all(r.active_models >= 1 for r in trace.records)
    assert all(r.active_columns >= r.active_models for r in trace.records)
    assert {r.bucket for r in trace.records} == {2, 4}
    assert trace.phase_totals["solve"] > 0
    # Tracing must not perturb trajectories.
    for kt0, kt_cals in zip(kts, results):
        kt_als, _ = cp_als(x, kt0, AlsParams(tol=1e-9))
        np.testing.assert_allclose(
            to_tensor(kt_cals), to_tensor(kt_als), atol=TOL
        )


def test_cals_5d_equals_als():
    """N-D generality of the whole engine (the reference supports N-D via
    mttkrp_impl, mttkrp.cpp:567): 5-D tensor through bucketing, eviction,
    and the KRP path."""
    key = jax.random.PRNGKey(17)
    kx, kk, kn = jax.random.split(key, 3)
    modes5 = (5, 4, 3, 3, 2)
    x = to_tensor(random_ktensor(kx, modes5, 2))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    kts = [random_ktensor(k, modes5, 2) for k in jax.random.split(kk, 5)]
    params = CalsParams(tol=1e-9, buffer_size=4, bucket_ranks=(2,))
    results, rep = cp_cals(x, kts, params)
    for kt0, kt_cals, mrep in zip(kts, results, rep.models):
        kt_als, rep_als = cp_als(x, kt0, AlsParams(tol=1e-9))
        assert rep_als.iters == mrep.iters
        np.testing.assert_allclose(
            to_tensor(kt_cals), to_tensor(kt_als), atol=TOL
        )


def test_random_spec_queue_equals_materialized():
    """RandomKtensorSpec intake (device-generated initial guesses) must be
    bitwise-consistent: a spec queue's results equal the results of the same
    queue materialized via spec_to_ktensor up front, regardless of bucket
    padding and of spec/explicit mixing in one block."""
    from cp_cals_tpu.ktensor import RandomKtensorSpec, spec_to_ktensor

    key = jax.random.PRNGKey(23)
    kx, kn = jax.random.split(key)
    x = to_tensor(random_ktensor(kx, MODES, 3))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    specs = [
        RandomKtensorSpec(MODES, rank, seed=100 + i)
        for i, rank in enumerate((1, 2, 3, 4, 5, 6))
    ]
    params = CalsParams(tol=1e-9, buffer_size=24, bucket_ranks=(2, 4, 8))
    res_spec, rep_spec = cp_cals(x, specs, params)
    mats = [spec_to_ktensor(s) for s in specs]
    res_mat, rep_mat = cp_cals(x, mats, params)
    for a, b, ma, mb in zip(res_spec, res_mat, rep_spec.models, rep_mat.models):
        assert ma.iters == mb.iters
        for fa, fb in zip(a.factors, b.factors):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    # Mixed spec/explicit block: first half specs, second half explicit.
    mixed = specs[:3] + mats[3:]
    res_mix, _ = cp_cals(x, mixed, params)
    for a, b in zip(res_mix, res_mat):
        np.testing.assert_array_equal(
            np.asarray(a.factors[0]), np.asarray(b.factors[0])
        )
    # Eviction + refill path (buffer smaller than queue) with specs.
    small = CalsParams(tol=1e-9, buffer_size=8, bucket_ranks=(2, 4, 8))
    res_small, _ = cp_cals(x, specs, small)
    for a, b in zip(res_small, res_mat):
        np.testing.assert_allclose(
            to_tensor(a), to_tensor(b), atol=TOL
        )


def test_evict_batch_invariance():
    """Deferred eviction (config.evict_batch): freezing converged models on
    device and batching convergence events into one host sync must leave
    every model's result and iteration count identical to the per-event
    cadence — including through eviction + refill (small buffer)."""
    x, kts = make_problem(23, n_models=12, ranks=(3, 5, 7))
    base = CalsParams(
        tol=1e-7, max_iterations=300, bucket_ranks=(4, 8), buffer_size=24
    )
    ref, rep_ref = cp_cals(x, kts, base)
    import dataclasses

    for eb in (4, 64):
        got, rep_got = cp_cals(
            x, kts, dataclasses.replace(base, evict_batch=eb)
        )
        for a, b, ma, mb in zip(ref, got, rep_ref.models, rep_got.models):
            assert ma.iters == mb.iters
            # Deferral changes refill timing -> batch composition ->
            # GEMM tiling/reduction order; the repo-wide 1e-11 oracle
            # band applies, not bit equality.
            assert ma.fit == pytest.approx(mb.fit, abs=TOL)
            np.testing.assert_allclose(
                np.asarray(to_tensor(a)), np.asarray(to_tensor(b)), atol=TOL
            )

    # Deferral composed with the mixed-tier check (the production tol
    # config): same invariance.
    mt = dataclasses.replace(base, tol_check_interval=3)
    ref_mt, rep_mt = cp_cals(x, kts, mt)
    got_mt, rep_gmt = cp_cals(x, kts, dataclasses.replace(mt, evict_batch=8))
    for a, b, ma, mb in zip(ref_mt, got_mt, rep_mt.models, rep_gmt.models):
        assert ma.iters == mb.iters
        assert ma.fit == pytest.approx(mb.fit, abs=TOL)


def test_extrapolated_delta():
    """The mixed-tier stop's instantaneous-delta estimator (iteration.py):
    exact on geometric windows, conservative fallbacks everywhere else."""
    from cp_cals_tpu.solvers.iteration import extrapolated_delta

    K = 3
    for rho in (0.3, 0.5, 0.8, 0.95):
        d = rho ** np.arange(40)  # per-iteration deltas
        fit = np.cumsum(d)
        # window-average rates at checks K, 2K, 3K, ... (check j ends at
        # iteration (j+1)K-1 in 0-based delta indexing)
        rates = [
            (fit[(j + 1) * K - 1] - fit[j * K - 1]) / K for j in range(1, 10)
        ]
        for j in range(1, 9):
            true_d = d[(j + 2) * K - 1]
            if true_d < 1e-6:  # below f32 resolution of the test itself
                continue
            est = float(
                extrapolated_delta(
                    jnp.float64(rates[j]), jnp.float64(rates[j - 1]),
                    jnp.float64(K),
                )
            )
            if rho >= 0.2:  # inside the clamp: exact (f32 rounding aside)
                np.testing.assert_allclose(est, true_d, rtol=1e-4)
    # Fallbacks: no prior rate / negative rate / growing rate -> raw rate.
    f = lambda r, rp: float(
        extrapolated_delta(jnp.float64(r), jnp.float64(rp), jnp.float64(3))
    )
    assert f(1e-5, 0.0) == pytest.approx(1e-5)
    assert f(-1e-5, 2e-5) == pytest.approx(-1e-5)
    assert f(3e-5, 2e-5) == pytest.approx(3e-5)
    # Clamp: a 100x one-window collapse is credited at most rho=0.2.
    est = f(1e-7, 1e-1)
    assert est > 1e-7 * 3 * 4 / (5**3 - 1) * 0.999


def test_mixed_tier_tol_stopping():
    """tol_check_interval=K (mixed-tier stopping, config.py): with EQUAL
    tiers on the fp64 oracle the periodic check reads the same error the
    per-iteration criterion would, so each model must stop within
    [t_oracle, t_oracle + 2K] iterations (checks are K-quantized and the
    K-averaged delta lags the instantaneous one by < K iterations twice)
    and its fit must match the plain-tol fit to ~1e-8. Covers ALS, CALS
    with eviction/refill (checks stay engine-aligned because evictions
    only happen at checks), and the reported fit being the checked one."""
    K = 5
    x, kts = make_problem(7, n_models=9, ranks=(4,))
    oracle = [cp_als(x, kt, AlsParams(tol=1e-8, max_iterations=500)) for kt in kts]

    # Single-model ALS path.
    _, r_als = cp_als(
        x, kts[0], AlsParams(tol=1e-8, max_iterations=500, tol_check_interval=K)
    )
    assert oracle[0][1].iters <= r_als.iters <= oracle[0][1].iters + 2 * K
    assert abs(r_als.fit - oracle[0][1].fit) < 1e-7

    # CALS path with a small buffer (forces eviction + refill, staggered
    # slot phases).
    params = CalsParams(
        tol=1e-8, max_iterations=500, bucket_ranks=(4,), buffer_size=16,
        tol_check_interval=K,
    )
    res, rep = cp_cals(x, kts, params)
    for (kt_o, ro), kt_c, m in zip(oracle, res, rep.models):
        assert ro.iters <= m.iters <= ro.iters + 2 * K, (ro.iters, m.iters)
        assert abs(ro.fit - m.fit) < 1e-7
        np.testing.assert_allclose(
            to_tensor(kt_c), to_tensor(kt_o), atol=2e-5
        )


def test_mixed_tier_tol_stopping_sharded():
    """The hi-check state must shard (state_pspecs carries HiState)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from cp_cals_tpu.parallel.sharding import make_mesh

    x, kts = make_problem(8, n_models=8, ranks=(4,))
    params = CalsParams(
        tol=1e-8, max_iterations=500, bucket_ranks=(4,), buffer_size=32,
        tol_check_interval=5,
    )
    ref, rep_ref = cp_cals(x, kts, params)
    got, rep_got = cp_cals(x, kts, params, mesh=make_mesh(n_dp=4, n_tp=1))
    for a, b, ma, mb in zip(ref, got, rep_ref.models, rep_got.models):
        assert ma.iters == mb.iters
        np.testing.assert_allclose(
            np.asarray(to_tensor(a)), np.asarray(to_tensor(b)), atol=TOL
        )


def test_result_wire_dtype():
    """result_wire_dtype halves result bytes: trajectories and reports are
    identical (fits/errors computed on device before the cast); returned
    factors differ only by wire rounding and come back in the queue dtype."""
    x, kts = make_problem(11, n_models=6, ranks=(3, 5))
    params = CalsParams(tol=1e-8, buffer_size=16, bucket_ranks=(4, 8))
    ref, rep_ref = cp_cals(x, kts, params)
    import dataclasses

    for wire, rtol in (("float16", 2e-3), ("bfloat16", 2e-2)):
        pw = dataclasses.replace(params, result_wire_dtype=wire)
        got, rep_got = cp_cals(x, kts, pw)
        for a, b, ma, mb in zip(ref, got, rep_ref.models, rep_got.models):
            assert ma.iters == mb.iters
            assert ma.fit == mb.fit  # device-side, pre-cast
            assert b.lam.dtype == a.lam.dtype  # restored queue dtype
            assert b.factors[0].dtype == a.factors[0].dtype
            np.testing.assert_allclose(
                to_tensor(b), to_tensor(a), rtol=0, atol=rtol
            )


def test_mixed_tier_tol_stopping_nnls():
    """Mixed-tier checks composed with NNLS updates: same-tier oracle,
    so the check reads the exact error — stops within [t, t+2K] of the
    per-iteration NNLS stop and keeps factors non-negative."""
    K = 5
    x, kts = make_problem(31, n_models=4, ranks=(4,))
    base = AlsParams(
        tol=1e-8, max_iterations=400, update_method=UpdateMethod.NNLS
    )
    import dataclasses

    for kt in kts[:2]:
        kt_o, ro = cp_als(x, kt, base)
        kt_m, rm = cp_als(
            x, kt, dataclasses.replace(base, tol_check_interval=K)
        )
        assert ro.iters <= rm.iters <= ro.iters + 2 * K
        assert abs(ro.fit - rm.fit) < 1e-6
        for f in kt_m.factors:
            assert (np.asarray(f) >= 0).all()


def test_mixed_tier_with_line_search_no_blind_eviction():
    """Mixed-tier checks composed with NEC line search (ADVICE r4): a
    model must never evict on the very iteration a blind extrapolation was
    applied — the check's fit_hi reads the unvalidated candidate, and a
    regressed candidate gives rate < 0 < tol, which would evict factors
    the next-iteration revert would have rolled back.

    Adversarial construction: line_search_interval == tol_check_interval
    == 5 makes every extrapolation land exactly on a decision check, and a
    large fixed step makes most extrapolations regress (frequent reverts).
    The guard (conv gated on ~ls.updated_last) must leave every returned
    model at reference line-search quality: same final error as the plain
    per-iteration-stop line-search oracle to the fit tolerance band.
    """
    import dataclasses

    K = 5
    x, kts = make_problem(17, n_models=6, ranks=(3, 4))
    base = AlsParams(
        tol=1e-8, max_iterations=300, line_search=True,
        line_search_interval=K, line_search_step=4.0,
    )
    for kt in kts[:3]:
        kt_o, ro = cp_als(x, kt, base)
        kt_m, rm = cp_als(
            x, kt, dataclasses.replace(base, tol_check_interval=K)
        )
        # A blind-eviction bug returns an unreverted extrapolated model:
        # its error is catastrophically worse than the oracle's (the step-4
        # candidate overshoots by orders of magnitude). The guard keeps the
        # returned error in the oracle's band.
        assert rm.approx_error < ro.approx_error * 1.5 + 1e-6, (
            rm.approx_error, ro.approx_error,
        )
        assert abs(rm.fit - ro.fit) < 1e-5

    # Same composition through the CALS engine (eviction path).
    params = CalsParams(
        tol=1e-8, max_iterations=300, bucket_ranks=(4,), buffer_size=16,
        line_search=True, line_search_interval=K, line_search_step=4.0,
        tol_check_interval=K,
    )
    res, rep = cp_cals(x, kts, params)
    for kt0, m in zip(kts, rep.models):
        _, ro = cp_als(x, kt0, base)
        assert m.approx_error < ro.approx_error * 1.5 + 1e-6


def test_polish_tol_converges_each_model():
    """Polish-to-convergence (CalsParams.polish_tol, the statistics-grade
    fast tier): converged models keep sweeping at full precision until
    their own fit delta drops below polish_tol (polish_iters = cap).
    Reported iteration counts stay those of the engine stop; returned
    factors sit at (or past) the fixed point a long fixed-sweep polish
    reaches; in-flight models are untouched."""
    import dataclasses

    x, kts = make_problem(23, n_models=6, ranks=(2, 3, 4))
    base = CalsParams(
        tol=1e-6, max_iterations=60, bucket_ranks=(2, 4), buffer_size=12,
        sync_mode="evict",
    )
    res0, rep0 = cp_cals(x, kts, base)
    conv = dataclasses.replace(base, polish_iters=25, polish_tol=1e-9)
    res1, rep1 = cp_cals(x, kts, conv)
    x_norm = float(jnp.linalg.norm(x))
    for m0, m1 in zip(rep0.models, rep1.models):
        assert m0.id == m1.id and m0.iters == m1.iters  # polish != progress
    for k0, k1 in zip(res0, res1):
        f0 = 1.0 - float(jnp.linalg.norm(x - to_tensor(k0))) / x_norm
        f1 = 1.0 - float(jnp.linalg.norm(x - to_tensor(k1))) / x_norm
        assert f1 >= f0 - 1e-12  # monotone refinement
    # The to-convergence polish must reach what a deep fixed-sweep polish
    # reaches: one more ALS sweep beyond it moves the fit < polish_tol.
    from cp_cals_tpu.solvers import cp_als

    for k1, kt0, m in zip(res1, kts, rep1.models):
        ref, _ = cp_als(
            x, k1,
            AlsParams(tol=0.0, max_iterations=1, force_max_iter=True),
        )
        f1 = 1.0 - float(jnp.linalg.norm(x - to_tensor(k1))) / x_norm
        f2 = 1.0 - float(jnp.linalg.norm(x - to_tensor(ref))) / x_norm
        assert abs(f2 - f1) < 1e-8, (m.rank, f1, f2)


def test_mode_layouts_recompute_equivalent():
    """mode_layouts="recompute" (HBM policy, config.py) must be purely a
    memory/traffic trade: identical trajectories and results to the
    default materialized-layout policy."""
    import dataclasses

    x, kts = make_problem(29, n_models=6, ranks=(3, 5))
    base = CalsParams(tol=1e-8, buffer_size=16, bucket_ranks=(4, 8))
    ref, rep_ref = cp_cals(x, kts, base)
    got, rep_got = cp_cals(
        x, kts, dataclasses.replace(base, mode_layouts="recompute")
    )
    for a, b, ma, mb in zip(ref, got, rep_ref.models, rep_got.models):
        assert ma.iters == mb.iters
        assert ma.fit == mb.fit
        np.testing.assert_array_equal(
            np.asarray(to_tensor(a)), np.asarray(to_tensor(b))
        )


def test_dimtree_sweep_equivalence():
    """Dimension-tree sweep (config.dimtree): CALS(dimtree) must equal
    ALS(dimtree) at the bit-match band (both paths share the sweep), and
    dimtree vs per-mode must agree at fp64 trajectory tolerance (the
    shared-TTM reduction order differs only by roundoff)."""
    import dataclasses

    x, kts = make_problem(37, n_models=6, ranks=(2, 3, 4))
    p = CalsParams(
        tol=1e-9, buffer_size=12, bucket_ranks=(2, 4), dimtree="on"
    )
    res, rep = cp_cals(x, kts, p)
    for kt0, kc, m in zip(kts, res, rep.models):
        ka, ra = cp_als(x, kt0, AlsParams(tol=1e-9, dimtree="on"))
        assert ra.iters == m.iters
        np.testing.assert_allclose(
            to_tensor(kc), to_tensor(ka), atol=TOL
        )
    res2, rep2 = cp_cals(x, kts, dataclasses.replace(p, dimtree="off"))
    for a, b in zip(rep.models, rep2.models):
        assert abs(a.fit - b.fit) < 1e-8
    # Composition: jackknife + mixed-tier checks keep working with the
    # dimtree sweep (the hi-check MTTKRP stays per-mode).
    from cp_cals_tpu.solvers import jk_cp_als, jk_cp_cals

    kt_fit, _ = cp_als(x, kts[0], AlsParams(tol=1e-9, dimtree="on"))
    a = jk_cp_cals(x, [kt_fit], dataclasses.replace(
        p, max_iterations=8, force_max_iter=True, bucket_ranks=(2,)
    ))
    b = jk_cp_als(x, [kt_fit], AlsParams(
        max_iterations=8, force_max_iter=True, dimtree="on"
    ))
    for ka, kb in zip(a.results[0], b.results[0]):
        for fa, fb in zip(ka.factors, kb.factors):
            fa, fb = np.asarray(fa), np.asarray(fb)
            mask = np.isfinite(fa)
            np.testing.assert_allclose(fa[mask], fb[mask], atol=1e-9)
