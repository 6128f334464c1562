"""Reference-scale stress oracles (the CI slow lane, `-m slow`).

The reference's strongest invariant is exercised at FULL size here
(/root/reference/tests/cals/test_cals.cpp:13-86 `SimpleCorrectness`): 360
models (ranks 1-12 x 30 copies, shuffled) forced through a 30-column
buffer, so the engine runs continuous eviction / batched refill / tail
compaction at realistic occupancy churn — and concurrency must stay
invisible: CALS == sequential ALS == batched ALS reconstructions at 1e-11.
The fast default lane pins the same invariant on <= 12-model workloads;
this lane pins the slot/wave/compaction interactions that only appear
under hundreds of models of mixed rank cycling through a few slots.
"""

import random

import jax
import numpy as np
import pytest

from cp_cals_tpu import AlsParams, CalsParams
from cp_cals_tpu.ktensor import random_ktensor, to_tensor
from cp_cals_tpu.solvers import (
    cp_als,
    cp_batched_als,
    cp_cals,
    jk_cp_als,
    jk_cp_batched_als,
    jk_cp_cals,
)

TOL = 1e-11  # reference MODEL_DIFF_ACC, tests/cals/test_cals.cpp:7


@pytest.mark.slow
def test_simple_correctness_full_scale():
    """360 mixed-rank models through a 30-padded-column buffer."""
    modes = (13, 12, 11)  # reference test tensor (test_cals.cpp:45)
    key = jax.random.PRNGKey(0)
    x = to_tensor(random_ktensor(key, modes, 10))  # exact rank-10 target

    ranks = [r for r in range(1, 13) for _ in range(30)]
    random.Random(0).shuffle(ranks)
    kts = [
        random_ktensor(jax.random.PRNGKey(1000 + i), modes, r)
        for i, r in enumerate(ranks)
    ]

    params = CalsParams(
        tol=1e-5,
        max_iterations=1000,
        buffer_size=30,  # the reference's stress budget (test_cals.cpp:30)
        bucket_ranks=(2, 4, 8, 12),
    )
    results, rep = cp_cals(x, kts, params)
    assert rep.n_ktensors == len(kts)
    assert all(k is not None for k in results)

    # Sequential ALS oracle (reference runs all 360 through cp_als too).
    als_params = AlsParams(tol=1e-5, max_iterations=1000)
    worst = 0.0
    for kt0, kt_cals, m in zip(kts, results, rep.models):
        kt_als, r_als = cp_als(x, kt0, als_params)
        assert r_als.iters == m.iters, (m.rank, r_als.iters, m.iters)
        d = np.asarray(to_tensor(kt_cals)) - np.asarray(to_tensor(kt_als))
        worst = max(worst, float(np.linalg.norm(d)))
    assert worst < TOL, worst

    # Batched-ALS baseline (reference cp_omp_als): same-rank groups share
    # one batched program; must match CALS at the same band.
    by_rank: dict[int, list[int]] = {}
    for i, r in enumerate(ranks):
        by_rank.setdefault(r, []).append(i)
    worst_b = 0.0
    for r, idxs in by_rank.items():
        outs, reps_b = cp_batched_als(x, [kts[i] for i in idxs], als_params)
        for i, kt_b, rb in zip(idxs, outs, reps_b):
            assert rb.iters == rep.models[i].iters
            d = np.asarray(to_tensor(kt_b)) - np.asarray(
                to_tensor(results[i])
            )
            worst_b = max(worst_b, float(np.linalg.norm(d)))
    assert worst_b < TOL, worst_b


@pytest.mark.slow
def test_jk_function_correctness_full_scale():
    """JK FunctionCorrectness at the reference's scale
    (test_cals.cpp:299-362): 4 fitted rank-5 models on a 10x21x20 tensor,
    all 40 leave-one-out replicates through an 18-column buffer —
    jk_cp_cals == jk_cp_als == jk_cp_batched_als end-to-end, including
    rescaling and LSAP permutation adjustment, at 1e-11."""
    modes = (10, 21, 20)
    key = jax.random.PRNGKey(3)
    x = to_tensor(random_ktensor(key, modes, 5))

    # Pre-fit the 4 reference models (matched iteration counts via
    # force_max_iter keep the three drivers' trajectories comparable, as
    # the reference test does).
    fit_params = AlsParams(tol=1e-4, max_iterations=60, force_max_iter=True)
    fitted = []
    for i in range(4):
        kt0 = random_ktensor(jax.random.PRNGKey(50 + i), modes, 5)
        kt_f, _ = cp_als(x, kt0, fit_params)
        fitted.append(kt_f)

    cals_params = CalsParams(
        tol=1e-4, max_iterations=60, force_max_iter=True,
        buffer_size=18, bucket_ranks=(5,),
    )
    rep_cals = jk_cp_cals(x, fitted, cals_params)
    rep_als = jk_cp_als(x, fitted, fit_params)
    rep_bat = jk_cp_batched_als(x, fitted, fit_params)

    worst = 0.0
    for p in range(len(fitted)):
        for f in range(modes[0]):
            # jk_cp_cals replicates carry a NaN'd excluded row
            # (reference to_regular drops it); compare on the dropped-row
            # reconstruction like the reference does.
            t_cals = _drop_row_recon(rep_cals.results[p][f], f)
            t_als = _drop_row_recon(rep_als.results[p][f], f)
            t_bat = _drop_row_recon(rep_bat.results[p][f], f)
            worst = max(
                worst,
                float(np.linalg.norm(t_cals - t_als)),
                float(np.linalg.norm(t_als - t_bat)),
            )
    assert worst < TOL, worst


def _drop_row_recon(kt, fiber: int) -> np.ndarray:
    """Reconstruction with the jackknifed mode-0 row removed (the
    reference's to_regular().to_tensor(), ktensor.h:284-314)."""
    f0 = np.delete(np.asarray(kt.factors[0]), fiber, axis=0)
    rest = [np.asarray(f) for f in kt.factors[1:]]
    lam = np.asarray(kt.lam)
    return np.einsum("ir,jr,kr,r->ijk", f0, *rest, lam)
