"""Device-mesh sharding for the concurrent-model batch.

The reference is single-process shared-memory (SURVEY §2.4, §5.8) — this is
new capability: the CALS model-batch axis (the reference's buffer_size axis)
shards across TPU chips/hosts as **dp**, and the tensor's mode-0 axis can
additionally shard as **tp** for targets too large to replicate (the 500^3
multi-host config in BASELINE.json).

Idiomatic JAX: we annotate shardings on the jitted iteration's inputs and
outputs and let XLA's SPMD partitioner insert the collectives —
* dp (models): embarrassingly parallel, zero collectives in steady state;
* tp (tensor mode 0): psum for non-0-mode MTTKRPs and factor-0 gramians,
  small all-reduces for column norms — all riding ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CalsParams
from ..ktensor import Ktensor
from ..solvers.iteration import make_iteration
from ..solvers.state import HiState, LsState, SolverState

Array = jax.Array


def make_mesh(n_dp: int | None = None, n_tp: int = 1, devices=None) -> Mesh:
    """Mesh over (dp, tp). Default: all devices on dp."""
    devices = devices if devices is not None else jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_tp
    devs = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devs, ("dp", "tp"))


def _axis_if_divisible(mesh: Mesh | None, axis: str, size: int) -> str | None:
    """Shard ``size`` over ``axis`` only when it divides evenly; otherwise
    replicate that dimension. Small tail buckets (batch 1-2 on a 4-wide dp
    axis) stay correct — they just don't get dp parallelism."""
    if mesh is None:
        return axis
    n = mesh.shape.get(axis, 1)
    return axis if n > 0 and size % n == 0 else None


def ktensor_pspecs(
    kt: Ktensor, shard_mode0: bool, mesh: Mesh | None = None
) -> Ktensor:
    """PartitionSpecs for a batched Ktensor: batch on dp; factor-0 rows on tp
    when the tensor's mode 0 is sharded."""
    dp = _axis_if_divisible(mesh, "dp", kt.lam.shape[0])
    tp = (
        _axis_if_divisible(mesh, "tp", kt.factors[0].shape[1])
        if shard_mode0
        else None
    )
    f0 = P(dp, tp, None)
    rest = tuple(P(dp, None, None) for _ in kt.factors[1:])
    return Ktensor((f0,) + rest, P(dp, None))


def state_pspecs(
    state: SolverState, shard_mode0: bool, mesh: Mesh | None = None
) -> SolverState:
    """PartitionSpec pytree matching a batched SolverState."""
    kt_spec = ktensor_pspecs(state.kt, shard_mode0, mesh)
    dp = _axis_if_divisible(mesh, "dp", state.fit.shape[0])
    scalar = P(dp)
    grams = tuple(P(dp, None, None) for _ in state.grams)
    active = tuple(
        P(
            dp,
            _axis_if_divisible(mesh, "tp", a.shape[1])
            if (shard_mode0 and i == 0)
            else None,
            None,
        )
        for i, a in enumerate(state.active)
    )
    if isinstance(state.ls, LsState):
        # backup_active mirrors state.active (non-empty only under NNLS);
        # omitting it breaks device_put's tree-prefix match for NNLS+LS runs.
        ls = LsState(
            it=scalar,
            updated_last=scalar,
            prev=kt_spec,
            backup=kt_spec,
            backup_err=scalar,
            backup_fit=scalar,
            backup_old_fit=scalar,
            backup_iters=scalar,
            backup_active=active if state.ls.backup_active else (),
        )
    else:
        ls = ()
    hi = (
        HiState(
            fit_prev=scalar, iters_prev=scalar, rate_prev=scalar,
            gap_prev=scalar,
        )
        if isinstance(state.hi, HiState)
        else ()
    )
    return SolverState(
        kt=kt_spec,
        grams=grams,
        rank_mask=P(dp, None),
        iters=scalar,
        fit=scalar,
        old_fit=scalar,
        approx_error=scalar,
        converged=scalar,
        alive=scalar,
        jk_fiber=scalar,
        x_norm_model=scalar,
        active=active,
        ls=ls,
        hi=hi,
    )


def tensor_pspec(x: Array, shard_mode0: bool, mesh: Mesh | None = None) -> P:
    tp = (
        _axis_if_divisible(mesh, "tp", x.shape[0]) if shard_mode0 else None
    )
    return P(tp, *([None] * (x.ndim - 1)))


def to_shardings(mesh: Mesh, spec_tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda s: isinstance(s, P),
    )


def make_sharded_step(
    params: CalsParams, mesh: Mesh, x: Array, state: SolverState,
    shard_mode0: bool = False,
):
    """Jit the batched CALS iteration with mesh shardings; returns
    (step_fn, sharded_x, sharded_state)."""
    iteration = make_iteration(params, batched=True)
    x_sh = NamedSharding(mesh, tensor_pspec(x, shard_mode0, mesh))
    st_sh = to_shardings(mesh, state_pspecs(state, shard_mode0, mesh))
    scalar_sh = NamedSharding(mesh, P())
    step = jax.jit(
        iteration,
        in_shardings=(x_sh, st_sh, scalar_sh),
        out_shardings=st_sh,
    )
    x_dev = jax.device_put(x, x_sh)
    state_dev = jax.device_put(state, st_sh)
    return step, x_dev, state_dev
