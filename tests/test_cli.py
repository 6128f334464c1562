"""CLI and experiments-harness end-to-end smoke on the CPU backend."""

import os

import jax
import jax.numpy as jnp


def test_cli_end_to_end(tmp_path, capsys):
    from cp_cals_tpu.cli import main

    csv = str(tmp_path / "out.csv")
    main(
        [
            "-t", "12-10-8", "-c", "1:2:2", "--noise", "0.01",
            "--tol", "1e-5", "--compare-als", "--csv", csv,
        ]
    )
    out = capsys.readouterr().out
    assert "CALS:" in out and "models/s" in out
    assert "speedup" in out
    assert os.path.exists(csv)
    with open(csv) as f:
        assert f.readline().startswith("KTENSOR_ID")


def test_cli_jackknife(capsys):
    from cp_cals_tpu.cli import main

    main(["-t", "8-7-6", "-c", "2:2:1", "--noise", "0.01", "--jk",
          "--max-iterations", "30"])
    out = capsys.readouterr().out
    assert "Jackknife: 8 replicates" in out


def test_compare_als_cals_harness(tmp_path):
    import jax.numpy as jnp

    from cp_cals_tpu.config import AlsParams, CalsParams
    from cp_cals_tpu.experiments import compare_als_cals, make_workload

    x, queue = make_workload((10, 9, 8), 1, 2, 2, dtype=jnp.float64)
    res = compare_als_cals(
        x,
        queue,
        CalsParams(max_iterations=5, force_max_iter=True, bucket_ranks=(2,)),
        AlsParams(max_iterations=5, force_max_iter=True),
        out_dir=str(tmp_path),
        warm=False,
    )
    assert res["n_models"] == 4
    assert res["n_mismatched"] == 0
    assert os.path.exists(tmp_path / "cals_run.csv")


def test_defrag_experiment_quick(tmp_path):
    from cp_cals_tpu.experiments import defrag_experiment

    out = defrag_experiment(
        modes=(12, 10, 8), rank_max=3, copies=2, max_iter=4,
        out_dir=str(tmp_path),
    )
    assert out["defrag"]["mean_iters"] <= 4
    # Random tensor at tol 1e-6 doesn't converge in 4 iters: all hit max.
    assert out["default"]["mean_iters"] == 4
    assert (tmp_path / "defrag_defrag.csv").exists()
    assert (tmp_path / "defrag_default.csv").exists()


def test_jackknife_real_experiment(tmp_path):
    """Reference §5.3 real-data JK protocol (experiments_jk.cpp:63-96) on
    a reference-format tensor file."""
    import numpy as np

    from cp_cals_tpu.experiments import jackknife_real_experiment
    from cp_cals_tpu.ktensor import random_ktensor_host
    from cp_cals_tpu.tensor_io import write_tensor

    rng = np.random.default_rng(3)
    kt = random_ktensor_host(rng, (6, 8, 7), 3, dtype=jnp.float32)
    x = np.einsum("ir,jr,kr,r->ijk", *kt.factors, kt.lam).astype(np.float32)
    x += 0.01 * x.std() * rng.standard_normal(x.shape).astype(np.float32)
    path = str(tmp_path / "toy.txt")
    write_tensor(path, x)
    out = jackknife_real_experiment(path, ranks=(2, 3), max_iter=20)
    assert out["modes"] == [6, 8, 7]
    assert out["n_replicates"] == 2 * 6  # one LOO set per fitted model
    assert out["jk_cals_s"] > 0 and out["jk_batched_als_s"] > 0


def test_scale_sweep_quick():
    """BASELINE config-5 harness leg (scaled down): spec queue, waves
    under a bounded buffer, throughput + FLOP accounting."""
    from cp_cals_tpu.experiments import scale_sweep

    out = scale_sweep(modes=(12, 10, 8), copies=2, rank_max=4, max_iter=3)
    assert out["n_models"] == 8
    assert out["models_per_sec"] > 0
