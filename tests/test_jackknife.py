"""Jackknife correctness (reference CalsJackknifingTests, test_cals.cpp:181-362).

LogicCorrectness: the masked-fiber trick inside CALS against the FULL tensor
must equal an explicit ALS on the (I-1)-row subsampled tensor, at matched
inits and matched iteration counts (force_max_iter).
FunctionCorrectness: jk_cp_cals == jk_cp_als end-to-end including rescaling
and LSAP permutation adjustment.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cp_cals_tpu import AlsParams, CalsParams
from cp_cals_tpu.ktensor import Ktensor, random_ktensor, to_tensor
from cp_cals_tpu.solvers import (
    cp_als,
    cp_cals,
    jackknife_norms,
    jk_cp_als,
    jk_cp_cals,
)
from cp_cals_tpu.utils.lsap import _solve_lsap_py, solve_lsap

MODES = (6, 7, 5)


def test_jackknife_norms():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, MODES, jnp.float64)
    norms = jackknife_norms(x)
    x_np = np.asarray(x)
    for i in range(MODES[0]):
        want = np.linalg.norm(np.delete(x_np, i, axis=0))
        np.testing.assert_allclose(float(norms[i]), want, rtol=1e-12)


def test_lsap_small():
    cost = np.array([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    perm = solve_lsap(cost)
    # brute force
    import itertools

    best = min(
        itertools.permutations(range(3)),
        key=lambda p: sum(cost[i, p[i]] for i in range(3)),
    )
    assert tuple(perm) == best


def test_lsap_random_vs_bruteforce():
    import itertools

    rng = np.random.default_rng(0)
    for _ in range(20):
        n = rng.integers(2, 6)
        cost = rng.normal(size=(n, n))
        for maximize in (False, True):
            perm = _solve_lsap_py(cost, maximize)
            sign = -1 if maximize else 1
            best = min(
                itertools.permutations(range(n)),
                key=lambda p: sign * sum(cost[i, p[i]] for i in range(n)),
            )
            got = sum(cost[i, perm[i]] for i in range(n))
            want = sum(cost[i, best[i]] for i in range(n))
            np.testing.assert_allclose(got, want, atol=1e-12)


def test_jk_masked_fiber_equals_subsampled_als():
    """LogicCorrectness (test_cals.cpp:181-297): zeroed-fiber CALS on the full
    tensor == ALS on the explicitly subsampled tensor."""
    key = jax.random.PRNGKey(1)
    kx, k0, kn = jax.random.split(key, 3)
    x = to_tensor(random_ktensor(kx, MODES, 3))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    x_np = np.asarray(x)
    kt_ref = random_ktensor(k0, MODES, 3)
    n_iter = 10

    for fiber in [0, 2, MODES[0] - 1]:
        # Masked-fiber run against the full tensor.
        norms = jackknife_norms(x)
        params = CalsParams(
            max_iterations=n_iter, force_max_iter=True, bucket_ranks=(4,)
        )
        results, _ = cp_cals(x, [kt_ref], params, jk_fibers=[fiber])
        kt_jk = results[0]

        # Oracle: subsampled tensor, same init without the fiber row.
        x_sub = jnp.asarray(np.delete(x_np, fiber, axis=0))
        f0 = np.delete(np.asarray(kt_ref.factors[0]), fiber, axis=0)
        kt0_sub = Ktensor(
            (jnp.asarray(f0),) + tuple(kt_ref.factors[1:]), kt_ref.lam
        )
        ap = AlsParams(max_iterations=n_iter, force_max_iter=True)
        kt_sub, rep_sub = cp_als(x_sub, kt0_sub, ap)

        # Compare reconstructions with the fiber row dropped.
        f0_jk = np.delete(np.asarray(kt_jk.factors[0]), fiber, axis=0)
        kt_jk_reg = Ktensor(
            (jnp.asarray(f0_jk),) + tuple(kt_jk.factors[1:]), kt_jk.lam
        )
        np.testing.assert_allclose(
            to_tensor(kt_jk_reg), to_tensor(kt_sub), atol=1e-10
        )


def test_jk_line_search_equals_subsampled_als():
    """Jackknife + line search: the masked-fiber CALS run must still equal
    the subsampled-tensor ALS oracle when extrapolation is on — in
    particular ERROR_CHECKING, whose accept test compares the candidate's
    exact error against the model's current (leave-one-out) error, so both
    must use the per-model LOO norm (reference line_search.cpp:86-153 +
    cals.cpp:295-301)."""
    key = jax.random.PRNGKey(7)
    kx, k0, kn = jax.random.split(key, 3)
    x = to_tensor(random_ktensor(kx, MODES, 3))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    x_np = np.asarray(x)
    kt_ref = random_ktensor(k0, MODES, 3)
    n_iter = 13  # crosses two interval-5 extrapolation points

    for method in ("error_checking", "no_error_checking"):
        from cp_cals_tpu.config import LineSearchMethod

        ls_kw = dict(
            line_search=True,
            line_search_interval=5,
            line_search_method=LineSearchMethod(method),
        )
        for fiber in [0, MODES[0] - 1]:
            params = CalsParams(
                max_iterations=n_iter, force_max_iter=True,
                bucket_ranks=(4,), **ls_kw,
            )
            results, _ = cp_cals(x, [kt_ref], params, jk_fibers=[fiber])
            kt_jk = results[0]

            x_sub = jnp.asarray(np.delete(x_np, fiber, axis=0))
            f0 = np.delete(np.asarray(kt_ref.factors[0]), fiber, axis=0)
            kt0_sub = Ktensor(
                (jnp.asarray(f0),) + tuple(kt_ref.factors[1:]), kt_ref.lam
            )
            ap = AlsParams(
                max_iterations=n_iter, force_max_iter=True, **ls_kw
            )
            kt_sub, _ = cp_als(x_sub, kt0_sub, ap)

            f0_jk = np.delete(np.asarray(kt_jk.factors[0]), fiber, axis=0)
            kt_jk_reg = Ktensor(
                (jnp.asarray(f0_jk),) + tuple(kt_jk.factors[1:]), kt_jk.lam
            )
            np.testing.assert_allclose(
                to_tensor(kt_jk_reg), to_tensor(kt_sub), atol=1e-10,
                err_msg=f"ls={method} fiber={fiber}",
            )


def test_jk_4d():
    """N-D jackknife: the full pipeline (masked fiber, LOO norms, rescale,
    LSAP adjustment over all non-jackknifed modes) on a 4-D tensor —
    beyond the reference, which is 3-D only here (utils.cpp:53-101)."""
    modes4 = (5, 4, 3, 3)
    key = jax.random.PRNGKey(11)
    kx, k0, kn = jax.random.split(key, 3)
    x = to_tensor(random_ktensor(kx, modes4, 2))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    kt_fit, _ = cp_als(x, random_ktensor(k0, modes4, 2),
                       AlsParams(tol=1e-10, max_iterations=300))
    n_iter = 15
    a = jk_cp_cals(x, [kt_fit], CalsParams(max_iterations=n_iter,
                                           force_max_iter=True,
                                           bucket_ranks=(2,)))
    b = jk_cp_als(x, [kt_fit], AlsParams(max_iterations=n_iter,
                                         force_max_iter=True))
    assert len(a.results[0]) == modes4[0]
    for ka, kb in zip(a.results[0], b.results[0]):
        for fa, fb in zip(ka.factors, kb.factors):
            fa, fb = np.asarray(fa), np.asarray(fb)
            mask = np.isfinite(fa)
            assert (mask == np.isfinite(fb)).all()
            np.testing.assert_allclose(fa[mask], fb[mask], atol=1e-8)


def test_jk_cp_cals_equals_jk_cp_als():
    """FunctionCorrectness (test_cals.cpp:299-362)."""
    key = jax.random.PRNGKey(2)
    kx, k0, kn = jax.random.split(key, 3)
    x = to_tensor(random_ktensor(kx, MODES, 2))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    kt0 = random_ktensor(k0, MODES, 2)
    # Fit the base model first (both drivers start from the fitted model).
    kt_fit, _ = cp_als(x, kt0, AlsParams(tol=1e-10, max_iterations=300))

    n_iter = 20
    cals_rep = jk_cp_cals(
        x,
        [kt_fit],
        CalsParams(max_iterations=n_iter, force_max_iter=True, bucket_ranks=(2,)),
    )
    als_rep = jk_cp_als(
        x, [kt_fit], AlsParams(max_iterations=n_iter, force_max_iter=True)
    )
    for kc, ka in zip(cals_rep.results[0], als_rep.results[0]):
        # NaN fiber rows in both; compare elementwise where finite.
        for fc, fa in zip(kc.factors, ka.factors):
            fc, fa = np.asarray(fc), np.asarray(fa)
            mask = np.isfinite(fc)
            assert (mask == np.isfinite(fa)).all()
            np.testing.assert_allclose(fc[mask], fa[mask], atol=1e-8)
        np.testing.assert_allclose(kc.lam, ka.lam, atol=1e-8)


def test_jk_cp_batched_als_matches_jk_cp_cals():
    """jk via the task-parallel baseline == jk via the concurrent engine
    (reference FunctionCorrectness covers all three drivers)."""
    from cp_cals_tpu.solvers.jackknife import jk_cp_batched_als

    key = jax.random.PRNGKey(5)
    kx, k0, kn = jax.random.split(key, 3)
    x = to_tensor(random_ktensor(kx, MODES, 2))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    kt_fit, _ = cp_als(x, random_ktensor(k0, MODES, 2),
                       AlsParams(tol=1e-10, max_iterations=300))
    n_iter = 15
    a = jk_cp_cals(x, [kt_fit], CalsParams(max_iterations=n_iter,
                                           force_max_iter=True,
                                           bucket_ranks=(2,)))
    b = jk_cp_batched_als(x, [kt_fit], AlsParams(max_iterations=n_iter,
                                                 force_max_iter=True))
    for ka, kb in zip(a.results[0], b.results[0]):
        for fa, fb in zip(ka.factors, kb.factors):
            fa, fb = np.asarray(fa), np.asarray(fb)
            mask = np.isfinite(fa)
            np.testing.assert_allclose(fa[mask], fb[mask], atol=1e-9)


def test_write_cals_report_csv(tmp_path):
    from cp_cals_tpu.utils.timers import write_cals_report_csv
    from cp_cals_tpu.solvers.cals import CalsModelReport, CalsReport

    rep = CalsReport(n_ktensors=2, ktensor_comp_sum=5)
    rep.models = [CalsModelReport(0, 2, 9, 0.9, 1.0),
                  CalsModelReport(1, 3, 11, 0.95, 0.5)]
    p = str(tmp_path / "rep.csv")
    write_cals_report_csv(p, rep, CalsParams(tol=1e-5))
    text = open(p).read()
    assert "# tol=1e-05" in text and "KTENSOR_ID;RANK;ERROR;FIT;ITERS" in text


def test_jk_checkpoint_resume(tmp_path):
    """Checkpoint/resume through the jackknife driver: a checkpointed run
    matches the plain run; resuming from the completed archive reproduces
    it without refitting; and an INTERRUPTED jk-fibered engine run resumes
    exactly (leave-one-out norms and fibers restored from the snapshot)."""
    key = jax.random.PRNGKey(23)
    kx, k0, kn = jax.random.split(key, 3)
    x = to_tensor(random_ktensor(kx, MODES, 2))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    kt_fit, _ = cp_als(x, random_ktensor(k0, MODES, 2),
                       AlsParams(tol=1e-10, max_iterations=300))
    params = CalsParams(max_iterations=12, force_max_iter=True,
                        bucket_ranks=(2,), buffer_size=4)

    a = jk_cp_cals(x, [kt_fit], params)
    b = jk_cp_cals(x, [kt_fit], params, checkpoint_dir=str(tmp_path))
    c = jk_cp_cals(x, [kt_fit], params, checkpoint_dir=str(tmp_path),
                   resume=True)
    for ra, rb, rc in zip(a.results[0], b.results[0], c.results[0]):
        for fa, fb, fc in zip(ra.factors, rb.factors, rc.factors):
            fa, fb, fc = map(np.asarray, (fa, fb, fc))
            mask = np.isfinite(fa)
            np.testing.assert_allclose(fa[mask], fb[mask], atol=1e-11)
            np.testing.assert_allclose(fa[mask], fc[mask], atol=1e-11)

    # Interrupted jk-fibered engine run, resumed (cp_cals level).
    from cp_cals_tpu.solvers.jackknife import generate_jk_ktensors
    from cp_cals_tpu.ktensor import to_host, denormalize, normalize_full

    base = to_host(normalize_full(denormalize(kt_fit)))
    reps = generate_jk_ktensors(base)
    queue = [k for k, _ in reps]
    fibers = [f for _, f in reps]
    d2 = tmp_path / "interrupt"
    want, _ = cp_cals(x, queue, params, jk_fibers=fibers)
    part, _ = cp_cals(x, queue, params, jk_fibers=fibers,
                      checkpoint_dir=str(d2), max_rounds_per_bucket=1)
    assert any(k is None for k in part)
    got, _ = cp_cals(x, queue, params, jk_fibers=fibers,
                     checkpoint_dir=str(d2), resume=True)
    for w, g in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(to_tensor(w)), np.asarray(to_tensor(g)), atol=1e-11
        )


def test_jk_wire_dtype_and_mixed_check():
    """The production fast-tier JK config (bench.py JK leg): mixed-tier
    stopping checks + polish + half-width result wire, composed with the
    jackknife driver. Same-tier oracle (fp64 CPU, check tier == run tier)
    so the checks read the exact error: replicates must match the
    plain-stop run's within the wire rounding, iteration counts within
    the 2K check-quantization band, and the NaN'd fiber rows must agree."""
    import dataclasses

    key = jax.random.PRNGKey(5)
    kx, k0, kn = jax.random.split(key, 3)
    x = to_tensor(random_ktensor(kx, MODES, 2))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    kt_fit, _ = cp_als(
        x, random_ktensor(k0, MODES, 2), AlsParams(tol=1e-10, max_iterations=300)
    )

    base = CalsParams(tol=1e-8, max_iterations=200, bucket_ranks=(2,))
    plain = jk_cp_cals(x, [kt_fit], base)
    K = 5
    fast = jk_cp_cals(
        x,
        [kt_fit],
        dataclasses.replace(
            base,
            tol_check_interval=K,
            polish_iters=2,
            result_wire_dtype="float16",
        ),
    )
    for kp, kf in zip(plain.results[0], fast.results[0]):
        for fp_, ff in zip(kp.factors, kf.factors):
            fp_, ff = np.asarray(fp_), np.asarray(ff)
            mask = np.isfinite(fp_)
            assert (mask == np.isfinite(ff)).all()
            # float16 wire rounding (~5e-4 relative) dominates the band.
            np.testing.assert_allclose(fp_[mask], ff[mask], atol=5e-3)


def test_jk_fidelity_pin_rules():
    """_pin_jk_fidelity (solvers/jackknife.py): dimtree 'auto' resolves
    to off; epilogue 'auto' resolves to the fused kernels ONLY on TPU
    with the default GJ solve (CPU stays unfused — interpret mode is the
    test configuration, not a production path — and an explicit
    solve_method must not be silently replaced by the kernel's GJ
    inverse); explicit settings pass through untouched."""
    from cp_cals_tpu.solvers.jackknife import _pin_jk_fidelity

    p = _pin_jk_fidelity(CalsParams())
    assert p.dimtree == "off"
    # CPU backend (the test environment): no fused pin.
    assert p.epilogue == "auto"
    p2 = _pin_jk_fidelity(CalsParams(solve_method="chol"))
    assert p2.epilogue == "auto" and p2.solve_method == "chol"
    p3 = _pin_jk_fidelity(CalsParams(dimtree="on", epilogue="xla"))
    assert p3.dimtree == "on" and p3.epilogue == "xla"
