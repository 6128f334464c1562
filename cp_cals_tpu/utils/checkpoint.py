"""Checkpoint/resume of solver state.

The reference has none (SURVEY §5.4) — nearest artifacts are text tensors
and CSV results. Here every bit of solver progress lives in one explicit
pytree (SolverState) plus the host-side queue/slot metadata, so snapshots
are trivial: an .npz of the state leaves + a JSON sidecar of the metadata.
Used by the CALS engine for periodic snapshots and by long jackknife runs.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..solvers.state import SolverState


def _base(path: str) -> str:
    return path[: -len(".npz")] if path.endswith(".npz") else path


def _to_host(leaf) -> np.ndarray:
    """Materialize a (possibly process-sharded) leaf on every host.

    Under jax.distributed a dp-sharded state leaf is not fully
    addressable; process_allgather is a COLLECTIVE, so every process must
    reach this call in the same order (the engine calls save_state from
    its lockstep host loop). Single-process arrays take the plain path.
    """
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils

        leaf = multihost_utils.process_allgather(leaf, tiled=True)
    return np.asarray(leaf)


def save_state(path: str, state: SolverState, meta: dict | None = None) -> None:
    leaves, treedef = jax.tree.flatten(state)
    # The gather is collective (all processes participate, identical
    # results); the DISK WRITE is process 0's alone — concurrent writes of
    # the same file from several processes would interleave/corrupt.
    host_leaves = [_to_host(l) for l in leaves]
    if jax.process_index() != 0:
        return
    np.savez_compressed(
        _base(path) + ".npz",
        **{f"leaf_{i}": l for i, l in enumerate(host_leaves)},
    )
    side = {"treedef": str(treedef), "n_leaves": len(leaves)}
    if meta:
        side["meta"] = meta
    with open(_base(path) + ".meta.json", "w") as f:
        json.dump(side, f)


def load_state(path: str, template: SolverState) -> tuple[SolverState, dict]:
    """Restore into the structure of ``template`` (shapes must match)."""
    data = np.load(_base(path) + ".npz")
    leaves, treedef = jax.tree.flatten(template)
    if len(data.files) != len(leaves):
        raise ValueError(
            f"checkpoint at {path!r} has {len(data.files)} state leaves "
            f"but the current SolverState layout has {len(leaves)} — it "
            "was written by a different library version and cannot be "
            "resumed; restart the run without resume=True"
        )
    loaded = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    for a, b in zip(loaded, leaves):
        if a.shape != jnp.shape(b):
            raise ValueError(f"shape mismatch {a.shape} vs {jnp.shape(b)}")
    state = jax.tree.unflatten(treedef, loaded)
    meta = {}
    sidecar = _base(path) + ".meta.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f).get("meta", {})
    return state, meta
