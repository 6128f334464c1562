"""Randomized config-interaction equivalence sweep.

The per-feature suites (test_cals/test_als/test_nnls/...) each pin one
knob; engine bugs hide in the INTERACTIONS (e.g. NNLS + line search +
eviction + threads + 4-D). This sweep samples whole-engine configurations
deterministically (seeded — no flakiness) and re-asserts the bedrock
invariant on each: CALS trajectories are bit-matched to sequential ALS at
~1e-11 through padding, packing, eviction and refill (reference
tests/cals/test_cals.cpp:13-86 — their suite is also fixed-config;
the sweep is extra coverage this side).
"""

import itertools
import random

import jax
import numpy as np
import pytest

from cp_cals_tpu import AlsParams, CalsParams, UpdateMethod
from cp_cals_tpu.config import LineSearchMethod
from cp_cals_tpu.ktensor import random_ktensor, to_tensor
from cp_cals_tpu.solvers import cp_als, cp_cals

TOL = 1e-11


def sample_config(rng: random.Random):
    shape = rng.choice([(9, 8, 7), (11, 6, 5), (5, 6, 4, 3)])
    nnls = rng.random() < 0.3
    ls = rng.random() < 0.5
    return {
        "shape": shape,
        "n_models": rng.choice([5, 9, 14]),
        "ranks": rng.choice([(1, 2, 3), (2, 5), (3, 4, 6)]),
        "params": CalsParams(
            tol=rng.choice([1e-8, 1e-9]),
            max_iterations=rng.choice([40, 200]),
            update_method=(
                UpdateMethod.NNLS if nnls else UpdateMethod.UNCONSTRAINED
            ),
            line_search=ls,
            line_search_interval=rng.choice([3, 5]),
            line_search_method=rng.choice(list(LineSearchMethod)),
            buffer_size=rng.choice([10, 16, 4200]),
            bucket_ranks=rng.choice([(2, 4, 8), (4, 8), (8,)]),
            sync_mode=rng.choice(["evict", "iter"]),
            bucket_threads=rng.choice([1, 3]),
            tail_compaction_depth=rng.choice([0, 2]),
            force_max_iter=rng.random() < 0.2,
            solve_method=rng.choice(["gj", "chol"]),
            # Round-4 knobs. K=5 only (max_iterations above are multiples
            # of 5, so capped evictions also land on check boundaries and
            # refilled models keep solo-ALS check phase); polish/wire stay
            # out of this sweep (they intentionally change the returned
            # factors beyond the 1e-11 bit-match band).
            tol_check_interval=rng.choice([0, 5]),
            evict_batch=rng.choice([1, 4, 16]),
            # Round-5 knobs: the layout policy must be trajectory-
            # invariant (it only moves WHERE transposes happen), so it
            # belongs in the bit-match sweep. polish_tol stays out for
            # the same reason polish_iters does (it refines returned
            # factors past the oracle band by design).
            mode_layouts=rng.choice(
                ["auto", "materialized", "recompute"]
            ),
            # Dimension-tree sweep: trajectory-defining (different
            # reduction order than per-mode), so CALS and the ALS oracle
            # must sample the SAME choice (both paths implement it).
            dimtree=rng.choice(["auto", "on", "off"]),
        ),
    }


@pytest.mark.parametrize("seed", range(3))
def test_random_config_jk(seed):
    """Randomized jackknife configs: jk_cp_cals (masked-fiber trick,
    one concurrent run) must reproduce jk_cp_als (materialized subsampled
    tensors, sequential) across sampled engine knobs."""
    from cp_cals_tpu.solvers import jk_cp_als, jk_cp_cals

    rng = random.Random(2000 + seed)
    shape = rng.choice([(6, 7, 5), (5, 4, 3, 3)])
    rank = rng.choice([2, 3])
    n_iter = rng.choice([8, 15])
    threads = rng.choice([1, 3])
    key = jax.random.PRNGKey(seed)
    kx, k0, kn = jax.random.split(key, 3)
    x = to_tensor(random_ktensor(kx, shape, 2))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    kt_fit, _ = cp_als(x, random_ktensor(k0, shape, rank),
                       AlsParams(tol=1e-10, max_iterations=300))
    a = jk_cp_cals(x, [kt_fit], CalsParams(
        max_iterations=n_iter, force_max_iter=True,
        bucket_ranks=(rank,), bucket_threads=threads,
        buffer_size=rng.choice([rank * 3, 4200]),
    ))
    b = jk_cp_als(x, [kt_fit], AlsParams(
        max_iterations=n_iter, force_max_iter=True,
    ))
    assert len(a.results[0]) == shape[0]
    for ka, kb in zip(a.results[0], b.results[0]):
        for fa, fb in zip(ka.factors, kb.factors):
            fa, fb = np.asarray(fa), np.asarray(fb)
            mask = np.isfinite(fa)
            assert (mask == np.isfinite(fb)).all()
            np.testing.assert_allclose(fa[mask], fb[mask], atol=1e-8)


@pytest.mark.parametrize("seed", range(6))
def test_random_config_cals_equals_als(seed):
    rng = random.Random(1000 + seed)
    cfg = sample_config(rng)
    p: CalsParams = cfg["params"]
    key = jax.random.PRNGKey(seed)
    kx, kk, kn = jax.random.split(key, 3)
    x = to_tensor(random_ktensor(kx, cfg["shape"], 3))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    keys = jax.random.split(kk, cfg["n_models"])
    ranks = itertools.cycle(cfg["ranks"])
    kts = [random_ktensor(k, cfg["shape"], r)
           for k, r in zip(keys, ranks)]

    results, rep = cp_cals(x, kts, p)
    ap = AlsParams(
        tol=p.tol,
        max_iterations=p.max_iterations,
        update_method=p.update_method,
        line_search=p.line_search,
        line_search_interval=p.line_search_interval,
        line_search_method=p.line_search_method,
        force_max_iter=p.force_max_iter,
        solve_method=p.solve_method,
        tol_check_interval=p.tol_check_interval,
        dimtree=p.dimtree,
    )
    for kt0, kt_cals, mrep in zip(kts, results, rep.models):
        kt_als, rep_als = cp_als(x, kt0, ap)
        assert rep_als.iters == mrep.iters, (cfg, rep_als.iters, mrep.iters)
        np.testing.assert_allclose(
            to_tensor(kt_cals), to_tensor(kt_als), atol=TOL,
            err_msg=f"config: {cfg}",
        )
        np.testing.assert_allclose(
            mrep.approx_error, rep_als.approx_error, atol=TOL,
            err_msg=f"config: {cfg}",
        )
