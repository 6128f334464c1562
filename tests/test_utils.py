"""Utility-layer tests: tensor IO, checkpointing, CSV analysis, LUT, API."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from cp_cals_tpu.ktensor import (
    Ktensor,
    concatenate_ktensors,
    random_ktensor,
    random_ktensor_host,
    to_tensor,
)


def test_tensor_io_roundtrip(tmp_path):
    from cp_cals_tpu.tensor_io import read_tensor, write_tensor

    x = np.random.default_rng(0).normal(size=(5, 4, 3))
    p = str(tmp_path / "t.txt")
    write_tensor(p, x)
    y = read_tensor(p)
    np.testing.assert_array_equal(x, y)
    # Column-major on disk: value 2 in the flat stream is x[2,0,0].
    with open(p) as f:
        f.readline()
        vals = [float(f.readline()) for _ in range(3)]
    np.testing.assert_allclose(vals, x[:3, 0, 0])


def test_checkpoint_roundtrip(tmp_path):
    from cp_cals_tpu.solvers.state import init_state
    from cp_cals_tpu.utils.checkpoint import load_state, save_state

    kt = random_ktensor(jax.random.PRNGKey(0), (6, 5, 4), 3)
    st = init_state(kt, jnp.asarray(12.5))
    p = str(tmp_path / "ck")
    save_state(p, st, {"round": 3})
    st2, meta = load_state(p, st)
    assert meta == {"round": 3}
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_results_csv_and_analysis(tmp_path):
    from cp_cals_tpu.solvers.cals import CalsModelReport
    from cp_cals_tpu.utils.analysis import read_results_csv, summarize
    from cp_cals_tpu.utils.timers import write_ktensor_results_csv

    rows = [
        CalsModelReport(id=0, rank=3, iters=10, fit=0.9, approx_error=1.5),
        CalsModelReport(id=1, rank=3, iters=12, fit=0.95, approx_error=0.7),
        CalsModelReport(id=2, rank=5, iters=7, fit=0.99, approx_error=0.2),
    ]
    p = str(tmp_path / "res.csv")
    write_ktensor_results_csv(p, rows)
    back = read_results_csv(p)
    assert [r.id for r in back] == [0, 1, 2]
    s = summarize(back)
    assert s["n_models"] == 3
    assert s["best_error_by_rank"] == {3: 0.7, 5: 0.2}


def test_lut_store_and_lookup(tmp_path, monkeypatch):
    import cp_cals_tpu.utils.lut as lut

    monkeypatch.setattr(lut, "_ROOT", str(tmp_path))
    modes = (10, 9, 8)
    lut._store(modes, {"16x4:0": "twostep", "16x4:1": "krp_gemm"})
    got = lut.lookup_methods(modes, rank=4, batch=16)
    assert got[0] == "twostep" and got[1] == "krp_gemm"
    # mode 2 missing -> heuristic (mode 8 < max(10,9) -> twostep)
    assert got[2] == "twostep"


def test_heuristic_methods():
    from cp_cals_tpu.utils.lut import heuristic_methods

    # 3-D: twostep everywhere (measured on v5e: the TTM+TTV path runs at
    # the matmul roofline on every mode, while the KRP materialization is
    # VPU-bound; see heuristic_methods docstring).
    assert heuristic_methods((299, 301, 41)) == ("twostep",) * 3
    # N-D: twostep too — the TTM+TTV chain generalizes past 3-D (the
    # reference's N-D path falls back to KRP, mttkrp.cpp:567-568; ours
    # doesn't need to, and the KRP cost only grows with more modes).
    assert heuristic_methods((5, 5, 5, 5)) == ("twostep",) * 4


def test_concatenate_ktensors():
    kts = [random_ktensor(jax.random.PRNGKey(i), (5, 4, 3), 2) for i in range(3)]
    cat = concatenate_ktensors(kts)
    assert cat.rank == 6
    np.testing.assert_allclose(
        to_tensor(cat),
        sum(to_tensor(kt) for kt in kts),
        atol=1e-12,
    )


def test_random_ktensor_host_matches_normalization():
    kt = random_ktensor_host(0, (6, 5, 4), 3, dtype=jnp.float64)
    for f in kt.factors:
        np.testing.assert_allclose(np.linalg.norm(f, axis=0), 1.0, atol=1e-12)
    assert kt.lam.shape == (3,)


def test_api_cp_cals():
    from cp_cals_tpu.api import cp_cals

    x = np.array(to_tensor(random_ktensor(jax.random.PRNGKey(0), (8, 7, 6), 3)))
    x += 1e-3 * np.random.default_rng(0).normal(size=x.shape)
    res = cp_cals(x, ranks=[2, 3], tol=1e-7, maxiters=80)
    assert len(res.ktensors) == 2
    assert res.fits[1] > 0.9
    assert res.ktensors[0].rank == 2


def test_timers_trace_csv(tmp_path):
    from cp_cals_tpu.utils.timers import IterationRecord, RunTrace

    tr = RunTrace()
    tr.add(IterationRecord(1, 4, 64, 1000, 0.01))
    tr.add(IterationRecord(2, 3, 48, 900, 0.009))
    p = str(tmp_path / "trace.csv")
    tr.write_csv(p)
    assert tr.total_flops == 1900
    with open(p) as f:
        assert f.readline().startswith("ITER;MODELS;COLS")


def test_api_cp_cals_hybrid():
    """Two-phase hybrid driver (reference matlab_cp_cals_hybrid.cpp:159-207):
    best model per distinct rank is selected and jackknifed."""
    from cp_cals_tpu.api import cp_cals_hybrid

    x = np.array(to_tensor(random_ktensor(jax.random.PRNGKey(3), (6, 5, 4), 2)))
    x += 1e-3 * np.random.default_rng(1).normal(size=x.shape)
    result, best_models, jk = cp_cals_hybrid(
        x, ranks=[2, 2, 3], maxiters=40, tol=1e-7, seed=1
    )
    assert len(result.ktensors) == 3
    assert sorted(kt.rank for kt in best_models) == [2, 3]
    # The selected rank-2 model is the better of the two rank-2 fits.
    errs2 = [
        e for kt, e in zip(result.ktensors, result.errors) if kt.rank == 2
    ]
    best2 = next(kt for kt in best_models if kt.rank == 2)
    best2_err = min(
        e for kt, e in zip(result.ktensors, result.errors)
        if kt.rank == 2 and np.allclose(np.asarray(kt.lam), np.asarray(best2.lam))
    )
    assert best2_err == min(errs2)
    # One replicate per mode-0 fiber for each selected model.
    assert len(jk.results) == 2
    for reps in jk.results:
        assert len(reps) == x.shape[0]
        f0 = np.asarray(reps[0].factors[0])
        assert np.isnan(f0).any()  # left-out fiber row is NaN after rescale


def test_read_tensor_npy_npz(tmp_path):
    """read_tensor loads .npy/.npz directly alongside the reference text
    format (real-data workflows ship numpy archives, not per-line text)."""
    import numpy as np

    from cp_cals_tpu.tensor_io import read_tensor

    x = np.random.default_rng(3).standard_normal((5, 4, 3))
    p1 = tmp_path / "t.npy"
    np.save(p1, x)
    np.testing.assert_array_equal(read_tensor(str(p1)), x)
    p2 = tmp_path / "t.npz"
    np.savez(p2, x=x)
    np.testing.assert_array_equal(read_tensor(str(p2)), x)


def test_benchmark_dashboard():
    """The committed-artifact summarizer reads every round-5 benchmark
    JSON it finds and returns headline metrics (absent files skipped)."""
    from cp_cals_tpu.utils.analysis import benchmark_dashboard

    d = benchmark_dashboard()
    # The repo commits these artifacts; a fresh partial checkout may not.
    if "tol_leg" in d:
        assert d["tol_leg"]["models_per_sec"] > 0
    if "jk_se_fidelity_p99" in d:
        assert all(len(v) == 3 for v in d["jk_se_fidelity_p99"].values())
    assert benchmark_dashboard("/nonexistent") == {}
