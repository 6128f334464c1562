"""Jackknife resampling of CP decompositions.

TPU-native equivalent of the reference's flagship application
(`/root/reference/src/cals.cpp:397-446` jk_cp_cals,
`/root/reference/src/als.cpp:291-387` jk_cp_als,
`/root/reference/src/utils/utils.cpp:40-152` machinery):

* ``jk_cp_cals`` — hundreds of leave-one-sample-out refits computed
  concurrently against the FULL tensor by re-zeroing one row of the mode-0
  factor after every mode-0 update (no subsampled tensor copies), then
  rescaled and column-matched to the reference model via LSAP.
* ``jk_cp_als`` — the oracle: materializes the (I-1)-row subtensor per
  replicate and fits sequentially.
* ``jackknife_norms`` — per-fiber leave-one-out tensor norms as one device
  reduction (the reference's two-phase OpenMP reduction, utils.cpp:103-152).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AlsParams, CalsParams
from ..ktensor import Ktensor, denormalize, normalize_full
from ..utils.lsap import solve_lsap
from .als import cp_als
from .cals import CalsReport, cp_cals

Array = jax.Array


@jax.jit
def jackknife_norms(x: Array) -> Array:
    """norms[i] = |X with mode-0 fiber i removed| (reference utils.cpp:103-152).

    One squared-sum reduction over all non-leading axes + a total, computed
    in the widest enabled dtype (the subtraction is cancellation-prone).
    """
    from ..config import error_dtype

    dt = error_dtype()
    x64 = x.astype(dt)
    row_sq = jnp.sum(x64 * x64, axis=tuple(range(1, x.ndim)))
    total = jnp.sum(row_sq)
    # Clamp the cancellation-prone difference: when one fiber holds nearly
    # all the energy, fp32 rounding can drive it slightly negative and a
    # NaN norm would poison the whole replicate (ops/error.py clamps its
    # analogous expression the same way).
    return jnp.sqrt(jnp.maximum(total - row_sq, 0.0)).astype(x.dtype)


def generate_jk_ktensors(kt: Ktensor) -> list[tuple[Ktensor, int]]:
    """One replicate per mode-0 fiber, tagged with its left-out fiber
    (reference utils.cpp:40-51). The fiber row is NOT zeroed here — the
    solver zeroes it after each mode-0 update, exactly like the reference."""
    i0 = kt.factors[0].shape[-2]
    if i0 <= 1:
        raise ValueError("can't jackknife with a single sample")
    return [(kt, i) for i in range(i0)]


def jk_permutation_adjustment(
    kt_ref: Ktensor, replicates: list[Ktensor]
) -> list[Ktensor]:
    """Permute each replicate's columns to best match the reference model.

    Score M = sum over non-jackknifed modes of U_ref^T U_m (the reference's
    B_ref^T B_m + C_ref^T C_m for 3-D, utils.cpp:53-101, generalized to N-D
    by summing every mode except the jackknifed mode 0 — whose factor has a
    NaN/zero fiber row and so can't contribute a meaningful score).
    Maximized by LSAP; host-side R x R problems.
    """
    refs = [np.asarray(f) for f in kt_ref.factors[1:]]
    out = []
    for kt in replicates:
        m = sum(
            fr.T @ np.asarray(fm) for fr, fm in zip(refs, kt.factors[1:])
        )
        perm = solve_lsap(m, maximize=True)
        factors = tuple(f[..., perm] for f in kt.factors)
        out.append(Ktensor(factors, kt.lam[..., perm]))
    return out


@dataclass
class JKReport:
    pre_time: float = 0.0
    solver_time: float = 0.0
    results: list = field(default_factory=list)  # [model][fiber] -> Ktensor
    cals_report: CalsReport | None = None


def _rescale_replicate(kt: Ktensor, fiber: int) -> Ktensor:
    """Zero the fiber row, renormalize, then NaN the fiber row
    (reference cals.cpp:431-437). Pure host math: replicates arrive as
    host-backed Ktensors and the work is O(I*R) per replicate — device
    dispatch latency would dominate."""
    factors = [np.array(f) for f in kt.factors]
    lam = np.array(kt.lam)
    factors[0][..., fiber, :] = 0.0
    factors[0] = factors[0] * lam  # denormalize: fold lam into factor 0
    new_lam = np.ones_like(lam)
    for i, f in enumerate(factors):
        coeff = np.linalg.norm(f, axis=-2)
        safe = np.where(coeff != 0, coeff, 1.0)
        factors[i] = f / safe
        new_lam = new_lam * coeff
    factors[0][..., fiber, :] = np.nan
    return Ktensor(tuple(factors), new_lam)




def _pin_jk_fidelity(params: CalsParams) -> CalsParams:
    """Resolve the statistics-fidelity defaults for jackknife runs
    (docs/PROFILE.md JK precision policy); explicit settings are honored.

    - dimtree "auto" -> "off": the shared-TTM reduction order nudges SE
      fidelity past the advertised bar (mode-2 p99 1.43 -> 2.17,
      jk_fp32_vs_fp64.json tier f32_high_dimtree).
    - epilogue "auto" -> "fused", on TPU with the default GJ solve only:
      the fused kernels' manual bf16_3x solve (hi/lo split, f32
      accumulation between passes) is ~3x more accurate than the XLA
      high-precision path, and at the "high" statistics tier that is
      what keeps SE bands oracle-grade (measured: the XLA epilogue
      inflates p99 to 1.76/4.18/15.19 vs 0.23/0.42/1.43 — committed as
      tier f32_high_xla). Off-TPU the kernels would run in interpret
      mode (the test configuration), and a non-GJ solve_method must not
      be silently replaced by the kernel's Gauss-Jordan inverse.
    """
    import dataclasses

    import jax as _jax

    if getattr(params, "dimtree", "auto") == "auto":
        params = dataclasses.replace(params, dimtree="off")
    if (
        getattr(params, "epilogue", "auto") == "auto"
        and params.solve_method == "gj"
        and _jax.default_backend() == "tpu"
    ):
        params = dataclasses.replace(params, epilogue="fused")
    return params


def jk_cp_cals(
    x: Array,
    fitted: list[Ktensor],
    params: CalsParams = CalsParams(),
    checkpoint_dir: str | None = None,
    resume: bool = False,
    mesh=None,
    shard_mode0: bool = False,
) -> JKReport:
    """Jackknife every fitted model via ONE concurrent CALS run on the full
    tensor (reference cals.cpp:397-446).

    checkpoint_dir/resume: snapshot and resume the underlying concurrent
    run (hundreds of replicates make this the flagship long-running job;
    see cp_cals). The replicate queue is deterministic from ``fitted``, so
    a resumed call with the same inputs continues exactly.

    mesh/shard_mode0: shard the replicate batch (dp) and optionally tensor
    mode 0 (tp) over a device mesh — jackknife is pure data parallelism
    over replicates, the scaling axis of SURVEY §5.8."""
    import dataclasses
    import time

    t0 = time.perf_counter()
    params = _pin_jk_fidelity(params)
    # Renormalize, then pull to host once: each replicate references the
    # same host arrays, so bucket packing is a pure host copy.
    fitted = [to_host_model(kt) for kt in fitted]
    queue: list[Ktensor] = []
    fibers: list[int] = []
    spans: list[tuple[int, int]] = []
    for kt in fitted:
        reps = generate_jk_ktensors(kt)
        spans.append((len(queue), len(queue) + len(reps)))
        for kt_rep, fiber in reps:
            queue.append(kt_rep)
            fibers.append(fiber)
    # AOT pass over every program the run needs (cold-start: serial
    # compile-on-first-dispatch costs multiples of this). Sharded and
    # multi-process runs warm their own (sharded) executables too —
    # precompile_buckets serializes into lockstep order under
    # jax.distributed and threads otherwise.
    from .cals import precompile_buckets

    precompile_buckets(
        x, queue, params, has_jk=True, mesh=mesh, shard_mode0=shard_mode0
    )
    t1 = time.perf_counter()

    results, cals_rep = cp_cals(
        x, queue, params, jk_fibers=fibers,
        checkpoint_dir=checkpoint_dir, resume=resume,
        mesh=mesh, shard_mode0=shard_mode0,
    )
    t2 = time.perf_counter()

    report = JKReport(
        pre_time=t1 - t0, solver_time=t2 - t1, cals_report=cals_rep
    )
    for kt_ref, (lo, hi) in zip(fitted, spans):
        reps = [
            _rescale_replicate(results[i], fibers[i]) for i in range(lo, hi)
        ]
        report.results.append(jk_permutation_adjustment(kt_ref, reps))
    return report


def _drop_fiber(x: np.ndarray, fiber: int) -> np.ndarray:
    return np.delete(np.asarray(x), fiber, axis=0)


def _drop_fiber_kt(kt: Ktensor, fiber: int) -> Ktensor:
    f0 = np.asarray(kt.factors[0])
    f0 = np.delete(f0, fiber, axis=0)
    return Ktensor(
        (jnp.asarray(f0),) + tuple(kt.factors[1:]), kt.lam
    )


def jk_cp_batched_als(
    x: Array,
    fitted: list[Ktensor],
    params: AlsParams = AlsParams(),
) -> JKReport:
    """Jackknife via the batched-ALS baseline (reference ``jk_cp_omp_als``,
    als.cpp:415-501: OpenMP over replicate fits): replicates of one model
    share a rank, so all of a model's leave-one-out fits run as one batched
    program against the FULL tensor with masked fibers."""
    import time

    from .cals import cp_cals as _cals
    from ..config import CalsParams

    # One bucket per model at its exact rank = the task-parallel baseline
    # shape; reuse the concurrent engine with a single-rank bucket.
    import dataclasses as _dc

    report = JKReport()
    for kt_ref in fitted:
        t0 = time.perf_counter()
        kt_host = to_host_model(kt_ref)
        reps = generate_jk_ktensors(kt_host)
        queue = [k for k, _ in reps]
        fibers = [f for _, f in reps]
        # Carry EVERY AlsParams field the CalsParams schema shares — a
        # partial copy here silently ran the baseline with different
        # line-search/NNLS/solver settings than the caller requested.
        shared = {
            f.name: getattr(params, f.name)
            for f in _dc.fields(params)
            if any(g.name == f.name for g in _dc.fields(CalsParams))
        }
        p = _pin_jk_fidelity(
            CalsParams(**shared, bucket_ranks=(kt_host.rank,))
        )
        t1 = time.perf_counter()
        report.pre_time += t1 - t0
        results, _ = _cals(x, queue, p, jk_fibers=fibers)
        report.solver_time += time.perf_counter() - t1
        out = [_rescale_replicate(kt, f) for kt, f in zip(results, fibers)]
        report.results.append(jk_permutation_adjustment(kt_host, out))
    return report


def to_host_model(kt: Ktensor) -> Ktensor:
    """normalize_full(denormalize(kt)), computed on HOST after one bulk
    fetch. The factors are tiny ([I, R]); running the normalize chain
    eagerly on device costs ~8 one-op XLA programs per fitted-model shape
    (each a separate remote compile + dispatch on tunneled backends)."""
    from ..ktensor import to_host

    kt = to_host(kt)
    factors = [np.asarray(f) for f in kt.factors]
    lam0 = np.asarray(kt.lam)
    factors[0] = factors[0] * lam0[..., None, :]
    lam = np.ones_like(lam0)
    new = []
    for f in factors:
        coeff = np.linalg.norm(f, axis=-2)
        safe = np.where(coeff != 0, coeff, 1.0)
        new.append(f / safe[..., None, :])
        lam = lam * coeff
    return Ktensor(tuple(new), lam)


def jk_cp_als(
    x: Array,
    fitted: list[Ktensor],
    params: AlsParams = AlsParams(),
) -> JKReport:
    """Oracle jackknife: explicit (I-1)-row subtensor per replicate
    (reference als.cpp:291-387). O(I * |X|) extra traffic — for testing."""
    import time

    t0 = time.perf_counter()
    fitted = [normalize_full(denormalize(kt)) for kt in fitted]
    x_np = np.asarray(x)
    report = JKReport()
    t1 = time.perf_counter()
    for kt_ref in fitted:
        i0 = kt_ref.factors[0].shape[-2]
        reps = []
        for fiber in range(i0):
            x_jk = jnp.asarray(_drop_fiber(x_np, fiber))
            kt0 = _drop_fiber_kt(kt_ref, fiber)
            kt_fit, _ = cp_als(x_jk, kt0, params)
            kt_fit = normalize_full(denormalize(kt_fit))
            # Re-insert a NaN row at the fiber position so replicate shapes
            # match jk_cp_cals output (reference keeps an I-row model with a
            # NaN fiber, cals.cpp:431-437).
            f0 = np.asarray(kt_fit.factors[0])
            f0 = np.insert(f0, fiber, np.nan, axis=0)
            reps.append(
                Ktensor((jnp.asarray(f0),) + tuple(kt_fit.factors[1:]), kt_fit.lam)
            )
        report.results.append(jk_permutation_adjustment(kt_ref, reps))
    report.pre_time = t1 - t0
    report.solver_time = time.perf_counter() - t1
    return report
