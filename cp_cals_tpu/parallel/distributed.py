"""Multi-host initialization and pod-slice meshes.

New capability vs the reference (single-node shared memory, SURVEY §5.8).
On a TPU pod slice each host runs the same program; ``initialize()`` wires
up `jax.distributed`, and ``pod_mesh`` builds the (dp, tp) mesh over all
chips. The CALS model batch shards over dp (embarrassingly parallel over
ICI/DCN); the tensor replicates per chip, or shards its mode 0 over tp for
targets too large to replicate (the 500^3 multi-host config in
BASELINE.json).

Launch pattern (one process per host, e.g. under a pod-slice scheduler):

    from cp_cals_tpu.parallel import distributed
    distributed.initialize()           # no-op on single process
    mesh = distributed.pod_mesh(n_tp=1)
    ... build sharded state via parallel.sharding.make_sharded_step ...
"""

from __future__ import annotations

import os

import jax

from .sharding import make_mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Single-process runs (no coordinator configured) are a no-op."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator_address and (num_processes or 1) <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def pod_mesh(n_tp: int = 1):
    """Mesh over every chip in the slice: dp x tp."""
    n = len(jax.devices())
    if n % n_tp:
        raise ValueError(f"{n} devices not divisible by tp={n_tp}")
    return make_mesh(n_dp=n // n_tp, n_tp=n_tp)


def is_coordinator() -> bool:
    return jax.process_index() == 0
