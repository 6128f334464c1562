"""MTTKRP method autotuning + lookup tables.

Equivalent of the reference's LUT system (`/root/reference/src/utils/
mttkrp.cpp:19-52` runtime reader, `scripts/python/mttkrp/generate_LUTs.py`
offline generator, `data/<BACKEND>/lookup_tables/` shipped tables): per
(tensor shape, bucket rank, batch) and per mode, measure each contraction
strategy and cache the winner. The reference keys tables by thread count;
here the key is the device kind.

Tables are JSON files under ``data/lookup_tables/<device>/<d0-d1-.../>.json``
mapping ``"BxR:mode" -> method``.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
    "lookup_tables",
)

METHODS = ("krp_gemm", "twostep", "pallas")


def _device_tag() -> str:
    d = jax.devices()[0]
    return f"{d.platform}-{getattr(d, 'device_kind', 'unknown')}".replace(" ", "_")


def _table_path(modes) -> str:
    shape = "-".join(str(m) for m in modes)
    return os.path.join(_ROOT, _device_tag(), f"{shape}.json")


def _load(modes) -> dict:
    path = _table_path(modes)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _store(modes, table: dict) -> None:
    path = _table_path(modes)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)


def heuristic_methods(modes, rank: int = 0, batch: int = 0) -> tuple[str, ...]:
    """Default when no LUT entry exists (analog of mttkrp.cpp:588-606).

    TWOSTEP for every mode of a 3-D tensor. Measured on hardware (v5e,
    scripts/profile_iteration.py, EEM shape 299x301x41 at B*R=1920): the
    twostep TTM+TTV runs at 67-78 TF/s on ALL modes — within ~0.8x of a
    pure matmul of the same shape — while KRP-GEMM reaches only 2-13 TF/s,
    because materializing the [prod(others), B*R] Khatri-Rao product is a
    VPU-bound broadcast-multiply write that dwarfs the matmul it feeds.
    The reference's CPU heuristic also defaults to its TWOSTEP variants
    when threaded (mttkrp.cpp:588-606). The B*R-dependent crossovers live
    in the measured LUT (autotune), which overrides this default.

    N-D (!=3) tensors also default to twostep: our TTM+TTV chain
    generalizes to any N (unlike the reference, whose N-D path falls back
    to the KRP form, mttkrp.cpp:567-568), and the KRP materialization cost
    only grows with more modes ([prod(others), B*R] is a 3+-factor KRP).
    A measured LUT entry still overrides this default per (shape, rank,
    batch, mode).
    """
    return tuple("twostep" for _ in modes)


def lookup_methods(modes, rank: int, batch: int) -> tuple[str, ...]:
    table = _load(modes)
    key = f"{batch}x{rank}"
    out = []
    for mode in range(len(modes)):
        m = table.get(f"{key}:{mode}")
        out.append(m if m in METHODS else None)
    if any(m is None for m in out):
        heur = heuristic_methods(modes, rank, batch)
        out = [m or h for m, h in zip(out, heur)]
    return tuple(out)


def autotune(modes, rank: int, batch: int, dtype=jnp.float32, reps: int = 3,
             precision: str = "high", margin: float = 0.10) -> tuple[str, ...]:
    # precision defaults to "high" — the engine's production matmul
    # precision — so LUT winners are measured on the path they steer.
    """Benchmark every method per mode (min-of-reps, like the reference's
    bench_mttkrp.h min-of-3) and persist the winners."""
    from ..config import resolve_precision
    from ..ops.mttkrp import mttkrp_batched

    prec = resolve_precision(precision)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, len(modes) + 1)
    x = jax.random.normal(ks[0], tuple(modes), dtype)
    factors = tuple(
        jax.random.normal(k, (batch, m, rank), dtype)
        for k, m in zip(ks[1:], modes)
    )

    import numpy as _np

    from ..ops.mttkrp import prepare_batched, resolve_batched_method

    n_loop = 20
    table = _load(modes)
    winners = []
    for mode in range(len(modes)):
        # Chain through a factor the MTTKRP actually READS (the first
        # non-target mode): feeding the output back into the TARGET
        # factor leaves the kernel loop-invariant and XLA hoists it out
        # of the loop, timing one kernel + n_loop trivial adds.
        other = [m for m in range(len(modes)) if m != mode][0]

        def make_fn(method, mode=mode, other=other):
            def run_fn(x, f):
                prepared = prepare_batched(
                    x, tuple(method for _ in modes)
                )

                def body(i, f):
                    g = mttkrp_batched(
                        x, f, mode, method, prec, prepared[mode]
                    )
                    # Reduce over the FULL output; a slice would let XLA
                    # narrow the kernel to one row and time nothing.
                    fo = f[other] + jnp.sum(
                        g, axis=-2, keepdims=True
                    ) * 1e-20
                    return f[:other] + (fo,) + f[other + 1 :]

                out = jax.lax.fori_loop(0, n_loop, body, f)
                # Return a device-side SCALAR: fetching any array would pay
                # the device->host link and swamp the kernel time on
                # remote-attached backends.
                return jnp.sum(out[other][..., 0, :]) * 1e-20

            return jax.jit(run_fn)

        # Compile every candidate first, then time them INTERLEAVED
        # (method A, B, C, A, B, C, ...): the shared chip's throughput
        # drifts 2-3x on a seconds timescale, so back-to-back pairs are the
        # only comparison that cancels the drift (docs/PROFILE.md).
        fns = {}
        for method in METHODS:
            if resolve_batched_method(method, len(modes), mode) != method:
                continue
            fn = make_fn(method)
            try:
                float(_np.asarray(fn(x, factors)))  # compile + sync
                fns[method] = fn
            except Exception:
                continue  # e.g. Mosaic unavailable on this backend
        times = {m: float("inf") for m in fns}
        for _ in range(reps):
            for method, fn in fns.items():
                t0 = time.perf_counter()
                float(_np.asarray(fn(x, factors)))
                times[method] = min(
                    times[method], (time.perf_counter() - t0) / n_loop
                )
        best = min(times, key=times.get) if times else None
        # Stability hysteresis: prefer the plain-XLA twostep unless a
        # challenger wins by more than the chip's residual measurement
        # noise (~10%); sub-noise "wins" flip run to run and would put the
        # Mosaic compile path in production for no real gain.
        if (
            best is not None
            and best != "twostep"
            and "twostep" in times
            and times["twostep"] <= times[best] * (1.0 + margin)
        ):
            best = "twostep"
        winners.append(best or "krp_gemm")
        table[f"{batch}x{rank}:{mode}"] = winners[-1]
    _store(modes, table)
    return tuple(winners)
