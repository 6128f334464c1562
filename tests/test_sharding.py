"""Sharding-invariance tests on the virtual 8-device CPU mesh.

New capability vs the reference (which is single-node shared-memory,
SURVEY §5.8): the concurrent-model batch shards over a (dp, tp) mesh and
results must be identical to the single-device run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cp_cals_tpu.config import CalsParams
from cp_cals_tpu.ktensor import Ktensor, random_ktensor, to_tensor
from cp_cals_tpu.parallel.sharding import make_mesh, make_sharded_step
from cp_cals_tpu.solvers.iteration import make_iteration
from cp_cals_tpu.solvers.state import init_state


def _setup(b=8, r=4, modes=(8, 7, 6), line_search=False):
    key = jax.random.PRNGKey(0)
    kx, kk, kn = jax.random.split(key, 3)
    x = to_tensor(random_ktensor(kx, modes, 3))
    x = x + 1e-3 * jax.random.normal(kn, x.shape, x.dtype)
    kts = [random_ktensor(k, modes, r) for k in jax.random.split(kk, b)]
    kt_b = jax.tree.map(lambda *fs: jnp.stack(fs), *kts)
    x_norm = jnp.linalg.norm(x.ravel())
    state = init_state(kt_b, x_norm, line_search=line_search)
    return x, state, x_norm


@pytest.mark.parametrize("n_dp,n_tp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_iteration_matches_single_device(n_dp, n_tp):
    if len(jax.devices()) < n_dp * n_tp:
        pytest.skip("needs 8 virtual devices")
    params = CalsParams(line_search=True)
    x, state, x_norm = _setup(line_search=True)
    iteration = make_iteration(params, batched=True)

    # Single-device reference: a few iterations.
    ref = state
    for _ in range(3):
        ref = jax.jit(iteration)(x, ref, x_norm)

    mesh = make_mesh(n_dp=n_dp, n_tp=n_tp)
    step, x_dev, st_dev = make_sharded_step(
        params, mesh, x, state, shard_mode0=(n_tp > 1)
    )
    got = st_dev
    for _ in range(3):
        got = step(x_dev, got, x_norm)

    np.testing.assert_allclose(
        np.asarray(got.fit), np.asarray(ref.fit), atol=1e-12
    )
    for fg, fr in zip(got.kt.factors, ref.kt.factors):
        np.testing.assert_allclose(np.asarray(fg), np.asarray(fr), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(got.approx_error), np.asarray(ref.approx_error), atol=1e-12
    )


def test_dryrun_multichip():
    """Run the driver's multichip dryrun the way the driver does: in a
    FRESH process. In-suite, the dryrun's end-to-end sharded cp_cals has
    segfaulted XLA:CPU's compiler under accumulated process state (jaxlib
    crash in backend_compile_and_load after ~70 suite tests; reproduced
    twice round 3, never in a fresh process) — subprocess isolation both
    matches the real invocation and sidesteps that."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "import sys; sys.path.insert(0, '/root/repo');"
            "from __graft_entry__ import dryrun_multichip;"
            "dryrun_multichip(8)",
        ],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "dryrun_multichip OK" in out.stdout


def test_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
