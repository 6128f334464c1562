"""Multi-process distributed equivalence (SURVEY §5.8, new-scope capability).

The strongest invariant, extended across process boundaries: a 2-process
jax.distributed run (4 virtual CPU devices per process, global (4, 2)
dp x tp mesh) must reproduce the single-process, mesh-free CALS results at
matched initial guesses to 1e-11 — concurrency, sharding AND process
decomposition are all invisible to each model's trajectory.

The reference has nothing distributed; this is the TPU build's analog of
its CALS ≡ ALS oracle (tests/cals/test_cals.cpp:13-86) for the multi-host
path driven by scripts/run_pod_slice.sh / cli --distributed.
"""

import json
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

MODES = (12, 10, 8)
RANKS = (1, 2, 3, 4) * 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _workload():
    rng = np.random.default_rng(0)
    from cp_cals_tpu.ktensor import random_ktensor_host

    kt = random_ktensor_host(rng, MODES, 3, dtype=np.float64)
    x = np.einsum("ir,jr,kr,r->ijk", *kt.factors, kt.lam)
    x += 1e-3 * rng.standard_normal(x.shape)
    queue = [
        random_ktensor_host(rng, MODES, r, dtype=np.float64) for r in RANKS
    ]
    return x, queue


_WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(
        "localhost:" + port, num_processes=2, process_id=pid
    )
    sys.path.insert(0, '@@REPO@@')
    import numpy as np, jax.numpy as jnp
    from jax.sharding import Mesh
    from cp_cals_tpu.config import CalsParams
    from cp_cals_tpu.ktensor import random_ktensor_host, to_tensor
    from cp_cals_tpu.solvers import cp_cals

    MODES, RANKS = @@MODES@@, @@RANKS@@
    rng = np.random.default_rng(0)
    kt = random_ktensor_host(rng, MODES, 3, dtype=np.float64)
    x = np.einsum("ir,jr,kr,r->ijk", *kt.factors, kt.lam)
    x += 1e-3 * rng.standard_normal(x.shape)
    queue = [
        random_ktensor_host(rng, MODES, r, dtype=np.float64)
        for r in RANKS
    ]
    # buffer smaller than the queue: eviction + refill run under the
    # multi-process mesh too.
    params = CalsParams(
        tol=1e-9, buffer_size=8, bucket_ranks=(2, 4), bucket_threads=1
    )
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("dp", "tp"))
    res, rep = cp_cals(jnp.asarray(x), queue, params, mesh=mesh)
    if pid == 0:
        np.savez(
            out_path,
            errors=np.array([m.approx_error for m in rep.models]),
            iters=np.array([m.iters for m in rep.models]),
            **{
                f"recon{i}": np.asarray(to_tensor(kt))
                for i, kt in enumerate(res)
            },
        )
    print("WORKER_DONE", pid, flush=True)
    """
)


def test_two_process_cals_equals_single_process(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    out_path = str(tmp_path / "mp_results.npz")
    prog = (
        _WORKER.replace("@@REPO@@", repo)
        .replace("@@MODES@@", repr(MODES))
        .replace("@@RANKS@@", repr(RANKS))
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", prog, str(i), str(port), out_path],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env={
                k: v
                for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
            },
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and "WORKER_DONE" in out, (
            f"process {i} failed:\n{out[-2000:]}"
        )
    mp = np.load(out_path)

    # Single-process, mesh-free oracle in THIS process.
    from cp_cals_tpu.config import CalsParams
    from cp_cals_tpu.ktensor import to_tensor
    from cp_cals_tpu.solvers import cp_cals

    x, queue = _workload()
    params = CalsParams(tol=1e-9, buffer_size=8, bucket_ranks=(2, 4))
    res, rep = cp_cals(x, queue, params)
    np.testing.assert_allclose(
        mp["errors"], [m.approx_error for m in rep.models], atol=1e-11
    )
    np.testing.assert_array_equal(mp["iters"], [m.iters for m in rep.models])
    for i, kt in enumerate(res):
        np.testing.assert_allclose(
            mp[f"recon{i}"], np.asarray(to_tensor(kt)), atol=1e-11
        )


_WORKER_CKPT = textwrap.dedent(
    """
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    pid, port = int(sys.argv[1]), sys.argv[2]
    out_path, ckpt_dir, phase = sys.argv[3], sys.argv[4], sys.argv[5]
    jax.distributed.initialize(
        "localhost:" + port, num_processes=2, process_id=pid
    )
    sys.path.insert(0, '@@REPO@@')
    import numpy as np, jax.numpy as jnp
    from jax.sharding import Mesh
    from cp_cals_tpu.config import CalsParams
    from cp_cals_tpu.ktensor import random_ktensor_host, to_tensor
    from cp_cals_tpu.solvers import cp_cals

    MODES, RANKS = @@MODES@@, @@RANKS@@
    rng = np.random.default_rng(0)
    kt = random_ktensor_host(rng, MODES, 3, dtype=np.float64)
    x = np.einsum("ir,jr,kr,r->ijk", *kt.factors, kt.lam)
    x += 1e-3 * rng.standard_normal(x.shape)
    queue = [
        random_ktensor_host(rng, MODES, r, dtype=np.float64)
        for r in RANKS
    ]
    params = CalsParams(
        tol=1e-9, buffer_size=8, bucket_ranks=(2, 4), bucket_threads=1
    )
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("dp", "tp"))
    if phase == "partial":
        res, rep = cp_cals(
            jnp.asarray(x), queue, params, mesh=mesh,
            checkpoint_dir=ckpt_dir, max_rounds_per_bucket=1,
        )
        assert any(k is None for k in res), "should be interrupted"
    else:
        res, rep = cp_cals(
            jnp.asarray(x), queue, params, mesh=mesh,
            checkpoint_dir=ckpt_dir, resume=True,
        )
        assert all(k is not None for k in res)
        if pid == 0:
            np.savez(
                out_path,
                iters=np.array([m.iters for m in rep.models]),
                ids=np.array([m.id for m in rep.models]),
                **{
                    f"recon{i}": np.asarray(to_tensor(kt))
                    for i, kt in enumerate(res)
                },
            )
    print("WORKER_DONE", pid, flush=True)
    """
)


def _run_two(prog, port, *argv):
    import os

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", prog, str(i), str(port), *argv],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env={
                k: v
                for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
            },
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and "WORKER_DONE" in out, (
            f"process {i} failed:\n{out[-2000:]}"
        )


def test_two_process_checkpoint_resume(tmp_path):
    """Multi-process kill-and-resume (VERDICT r3 weak #6, last sliver):
    a 2-process mesh run checkpointed and interrupted after one eviction
    round, then resumed by a FRESH 2-process run, must equal the
    uninterrupted single-process mesh-free oracle at 1e-11. Exercises the
    collective state gather in save_state (dp-sharded leaves are not
    fully addressable), the process-0-only disk writes, and the resume
    re-device_put onto the multi-process mesh."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prog = (
        _WORKER_CKPT.replace("@@REPO@@", repo)
        .replace("@@MODES@@", repr(MODES))
        .replace("@@RANKS@@", repr(RANKS))
    )
    out_path = str(tmp_path / "mp_resume.npz")
    ckpt_dir = str(tmp_path / "ckpt")
    _run_two(prog, _free_port(), out_path, ckpt_dir, "partial")
    assert os.path.exists(os.path.join(ckpt_dir, "bucket_r2.meta.json"))
    _run_two(prog, _free_port(), out_path, ckpt_dir, "resume")

    from cp_cals_tpu.config import CalsParams
    from cp_cals_tpu.ktensor import to_tensor
    from cp_cals_tpu.solvers import cp_cals

    x, queue = _workload()
    params = CalsParams(tol=1e-9, buffer_size=8, bucket_ranks=(2, 4))
    res, rep = cp_cals(x, queue, params)
    mp = np.load(out_path)
    np.testing.assert_array_equal(
        sorted(mp["ids"]), sorted(m.id for m in rep.models)
    )
    oracle_iters = {m.id: m.iters for m in rep.models}
    for mid, it in zip(mp["ids"], mp["iters"]):
        assert oracle_iters[int(mid)] == int(it)
    # results are returned in queue order in both runs
    for i, kt in enumerate(res):
        np.testing.assert_allclose(
            mp[f"recon{i}"], np.asarray(to_tensor(kt)), atol=1e-11
        )
