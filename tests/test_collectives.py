"""Compile-time collectives guard for the pod path (SURVEY §5.8).

Real multi-chip hardware is unavailable here, so the sharded engine's
steady-state communication claims (parallel/sharding.py: dp = zero
collectives, tp = psum-only reductions riding ICI) are verified at the HLO
level: lower the ACTUAL engine programs (the `_jitted_programs` step and
run-until-evict used by cp_cals) on the virtual 8-device CPU mesh and
count collective ops in the compiled module. This is the only available
protection against an accidental per-iteration all-gather that would
wreck pod scaling (reference analog: none — the reference is single-node).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cp_cals_tpu import CalsParams
from cp_cals_tpu.ktensor import random_ktensor, to_tensor
from cp_cals_tpu.parallel.sharding import (
    make_mesh,
    state_pspecs,
    tensor_pspec,
    to_shardings,
)
from cp_cals_tpu.solvers.cals import _jitted_programs
from cp_cals_tpu.solvers.state import init_state

# HLO opcodes that move data between devices. "start" variants covered by
# the prefix match; fusions repeat the opcode in their name, hence word
# boundaries on instruction positions only (lines look like
#   %x = f32[..] all-reduce(...), replica_groups=...).
_COLLECTIVE_RE = re.compile(
    r"=\s*\S+\s+(all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)(-start)?\(",
)
_SHAPE_RE = re.compile(r"=\s*(\w+)\[([\d,]*)\]")


def _collectives(compiled) -> list[tuple[str, int]]:
    """(opcode, element_count) for every collective in a compiled module."""
    out = []
    for line in compiled.as_text().splitlines():
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        sm = _SHAPE_RE.search(line)
        if sm and sm.group(2):
            n = int(np.prod([int(d) for d in sm.group(2).split(",") if d]))
        else:
            n = 1  # scalar or tuple-shaped; treat as small
        out.append((m.group(1), n))
    return out


def _lowered_programs(n_dp, n_tp, shard0, tol_check=0):
    if len(jax.devices()) < n_dp * n_tp:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_dp=n_dp, n_tp=n_tp)
    key = jax.random.PRNGKey(0)
    kx, kk = jax.random.split(key)
    x = to_tensor(random_ktensor(kx, (8, 6, 5), 2))
    kts = jax.tree.map(
        lambda *fs: jnp.stack(fs),
        *[random_ktensor(k, (8, 6, 5), 4) for k in jax.random.split(kk, 8)],
    )
    params = CalsParams(
        tol=1e-8, bucket_ranks=(4,), tol_check_interval=tol_check
    )
    state = init_state(
        kts, jnp.linalg.norm(x.ravel()), mixed_tol=tol_check > 0
    )
    x_dev = jax.device_put(
        x, to_shardings(mesh, tensor_pspec(x, shard0, mesh))
    )
    st_dev = jax.device_put(
        state, to_shardings(mesh, state_pspecs(state, shard0, mesh))
    )
    step, run = _jitted_programs(params, None, False, False)
    xn = jnp.asarray(1.0, x.dtype)
    return (
        step.lower(x_dev, st_dev, xn).compile(),
        run.lower(x_dev, st_dev, xn).compile(),
    )


def test_dp_steady_state_zero_collectives():
    """Pure dp (models sharded, tensor replicated): the iteration body must
    lower with ZERO collectives — every per-model op is local. The
    run-until-evict loop may carry only tiny control-flow reductions (the
    `any(converged & alive)` loop predicate), nothing data-sized."""
    step_c, run_c = _lowered_programs(n_dp=8, n_tp=1, shard0=False)
    assert _collectives(step_c) == [], _collectives(step_c)
    big = [(op, n) for op, n in _collectives(run_c) if n > 64]
    assert big == [], big


def test_dp_tp_only_expected_reductions():
    """dp x tp with the tensor's mode 0 sharded: non-0-mode contractions
    and factor-0 gramians legitimately psum over tp. Assert the compiled
    programs contain ONLY reduction-type collectives (all-reduce /
    reduce-scatter) plus small gathers — never an all-to-all, and never an
    all-gather of tensor-sized data (the pod-scaling killer)."""
    step_c, run_c = _lowered_programs(n_dp=4, n_tp=2, shard0=True)
    x_elems = 8 * 6 * 5
    for compiled in (step_c, run_c):
        cols = _collectives(compiled)
        assert all(op != "all-to-all" for op, _ in cols), cols
        gathers = [(op, n) for op, n in cols if op == "all-gather"]
        assert all(n < x_elems for _, n in gathers), gathers


def test_dp_mixed_tier_check_stays_small():
    """tol_check_interval adds a batch-max gate + a full-precision MTTKRP:
    under pure dp this must stay collective-free apart from the scalar
    gate reduction."""
    step_c, run_c = _lowered_programs(n_dp=8, n_tp=1, shard0=False,
                                      tol_check=5)
    for compiled in (step_c, run_c):
        big = [(op, n) for op, n in _collectives(compiled) if n > 64]
        assert big == [], big
