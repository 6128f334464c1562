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

# Dispatch-source accounting for the last process (reset with
# reset_lookup_stats): how many per-mode method decisions came from an
# exact LUT entry, from the nearest-B*R entry in the same table (the
# analog of the reference's lower_bound rank search, mttkrp.cpp:575-587),
# or from the shape heuristic. bench.py surfaces these so "100% LUT-backed
# dispatch" is checkable.
LOOKUP_STATS = {"exact": 0, "nearest": 0, "heuristic": 0}


def reset_lookup_stats() -> None:
    for k in LOOKUP_STATS:
        LOOKUP_STATS[k] = 0


import threading as _threading  # noqa: E402

_TUNE_LOCK = _threading.Lock()


def _tier(precision: str | None) -> str:
    """Normalize a matmul precision name to its LUT tier. "high" (bf16_3x)
    and "highest" (fp32 accum) share the full-precision tier — the measured
    method-ranking flip is between these and the 1-pass-bf16 "default" tier
    (data/benchmarks/pallas_tune.json) — so a default-config run
    (precision="highest") hits the committed un-suffixed entries exactly."""
    return "high" if precision in (None, "", "high", "highest") else precision


def _key(batch: int, rank: int, mode: int, precision: str = "high") -> str:
    """Table key. The matmul precision tier is part of the key because the
    method ranking flips with it (measured: at "high"/bf16_3x the Pallas
    fused kernel wins on 300^3 while at "default"/bf16 the XLA twostep is
    at the roofline everywhere, data/benchmarks/pallas_tune.json). The
    legacy un-suffixed form is the full-precision tier (round-2 tables)."""
    core = f"{batch}x{rank}"
    tier = _tier(precision)
    if tier != "high":
        core += f"@{tier}"
    return f"{core}:{mode}"


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


def heuristic_methods(
    modes, rank: int = 0, batch: int = 0, precision: str = "high"
) -> tuple[str, ...]:
    """Default when no LUT entry exists (analog of mttkrp.cpp:588-606).

    TWOSTEP for every mode by default. Measured on hardware (v5e,
    scripts/profile_iteration.py, EEM shape 299x301x41 at B*R=1920): the
    twostep TTM+TTV runs at the matmul roofline on ALL modes (131-192 TF/s
    at the bf16 tier, data/benchmarks/pallas_tune.json), while KRP-GEMM
    reaches only 2-13 TF/s, because materializing the [prod(others), B*R]
    Khatri-Rao product is a VPU-bound broadcast-multiply write that dwarfs
    the matmul it feeds. The reference's CPU heuristic also defaults to
    its TWOSTEP variants when threaded (mttkrp.cpp:588-606).

    The rank/batch-dependent boundary that IS measured: the twostep's
    [I_n * min(other modes), B*R] HBM intermediate. On the EEM shape it is
    ~94 MB per mode at B*R=1920 and twostep still wins; on 300^3 it is
    ~690 MB per mode and the fused Pallas kernel (which never materializes
    it) wins every mode at the "high" tier (committed LUT
    data/lookup_tables/tpu-TPU_v5_lite/300-300-300.json). The heuristic
    places the boundary at 256 MB, between the two measured points.
    Measured LUT entries (exact or nearest-B*R) always override this.

    N-D (!=3) tensors also default to twostep: our TTM+TTV chain
    generalizes to any N (unlike the reference, whose N-D path falls back
    to the KRP form, mttkrp.cpp:567-568), and the KRP materialization cost
    only grows with more modes.
    """
    out = []
    for n, dim in enumerate(modes):
        method = "twostep"
        if len(modes) == 3 and rank and batch and _tier(precision) == "high":
            others = [m for i, m in enumerate(modes) if i != n]
            inter_bytes = dim * min(others) * batch * rank * 4
            if inter_bytes > 256 * 1024 * 1024:
                method = "pallas"
        out.append(_screen(method, modes, n, rank, batch))
    return tuple(out)


def _screen(method: str, modes, mode: int, rank: int, batch: int) -> str:
    """Downgrade a 'pallas' pick the fused kernel cannot compile at this
    shape (scoped-VMEM gate, ops/pallas_mttkrp.py) — reachable when a
    nearest-B*R LUT entry measured at a smaller (batch, rank) is inherited
    by a bigger one, or from the shape heuristic."""
    if method == "pallas" and rank and batch:
        from ..ops.pallas_mttkrp import pallas_mttkrp_supported

        if not pallas_mttkrp_supported(tuple(modes), mode, batch, rank):
            return "twostep"
    return method


def _nearest(table: dict, batch: int, rank: int, mode: int,
             precision: str = "high") -> str | None:
    """Nearest measured entry for this mode by |log(B*R ratio)| — the
    TPU analog of the reference LUT's lower_bound rank search
    (mttkrp.cpp:575-587): an off-grid (batch, rank) inherits the method of
    the closest measured point instead of falling to a constant heuristic.
    Entries at the requested precision tier are preferred; other tiers are
    used only when the requested tier has no measurements at all."""
    import math

    target = batch * rank
    best = None  # (tier_penalty, distance, method)
    for key, method in table.items():
        if method not in METHODS:
            continue
        core, _, mode_s = key.partition(":")
        if mode_s != str(mode):
            continue
        if "@" in core:
            core, _, prec = core.partition("@")
        else:
            prec = "high"
        try:
            b_s, _, r_s = core.partition("x")
            br = int(b_s) * int(r_s)
        except ValueError:
            continue
        cand = (
            0 if prec == _tier(precision) else 1,
            abs(math.log(max(br, 1) / max(target, 1))),
            method,
        )
        if best is None or cand[:2] < best[:2]:
            best = cand
    return best[2] if best else None


def lookup_methods(
    modes, rank: int, batch: int, precision: str = "high"
) -> tuple[str, ...]:
    table = _load(modes)
    out = []
    for mode in range(len(modes)):
        m = table.get(_key(batch, rank, mode, precision))
        if m in METHODS:
            LOOKUP_STATS["exact"] += 1
            out.append(_screen(m, modes, mode, rank, batch))
            continue
        m = _nearest(table, batch, rank, mode, precision)
        if m is not None:
            LOOKUP_STATS["nearest"] += 1
            out.append(_screen(m, modes, mode, rank, batch))
            continue
        LOOKUP_STATS["heuristic"] += 1
        out.append(heuristic_methods(modes, rank, batch, precision)[mode])
    return tuple(out)


def has_exact_entries(modes, rank: int, batch: int,
                      precision: str = "high") -> bool:
    table = _load(modes)
    return all(
        table.get(_key(batch, rank, mode, precision)) in METHODS
        for mode in range(len(modes))
    )


def ensure_methods(
    modes, rank: int, batch: int, dtype=jnp.float32,
    precision: str = "high", reps: int = 3,
) -> tuple[str, ...]:
    """Return LUT methods for (shape, rank, batch, precision), autotuning
    and persisting any missing exact entries first (the runtime analog of
    the reference's offline generate_LUTs.py: every program the engine is
    about to compile gets a measured dispatch decision). Call on the
    production backend (TPU); measurement costs a few compiles per missing
    (batch, rank). Thread-safe: the engine resolves bucket methods from
    parallel bucket threads (solvers/cals.py), and concurrent autotunes of
    the same shape would duplicate compiles and race the table write."""
    if not has_exact_entries(modes, rank, batch, precision):
        with _TUNE_LOCK:
            if not has_exact_entries(modes, rank, batch, precision):
                autotune(modes, rank, batch, dtype=dtype, reps=reps,
                         precision=precision)
    return lookup_methods(modes, rank, batch, precision)


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
        table[_key(batch, rank, mode, precision)] = winners[-1]
    _store(modes, table)
    return tuple(winners)
