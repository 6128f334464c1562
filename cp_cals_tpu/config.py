"""Configuration structs for the TPU-native CP-CALS framework.

Mirrors the parameter surface of the reference solver configs
(`/root/reference/include/als.h:142-189`, `/root/reference/include/cals.h:138-183`)
re-expressed for a JAX/XLA execution model: no thread counts or CUDA flags —
instead dtype/precision policy and mesh sharding knobs.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp


class UpdateMethod(enum.Enum):
    """Factor update method (reference: include/utils/update.h:7)."""

    UNCONSTRAINED = "unconstrained"
    NNLS = "nnls"


class MttkrpMethod(enum.Enum):
    """MTTKRP contraction strategy (reference: include/utils/mttkrp.h:23-29).

    The reference's MTTKRP / TWOSTEP0 / TWOSTEP1 BLAS variants map to
    contraction *orderings* on TPU:
      KRP_GEMM : materialize the Khatri-Rao product, one big MXU matmul
                 (the reference's ``mttkrp_impl``).
      TWOSTEP  : contract the tensor with one factor first (TTM), then the
                 other (TTV) — never materializes the KRP.
      PALLAS   : fused Khatri-Rao x matmul Pallas kernel (no KRP in HBM).
      AUTO     : dispatch via the autotune LUT, else heuristic.
    """

    KRP_GEMM = "krp_gemm"
    TWOSTEP = "twostep"
    PALLAS = "pallas"
    AUTO = "auto"


class LineSearchMethod(enum.Enum):
    """Line-search method (reference: include/utils/line_search.h:8)."""

    NO_ERROR_CHECKING = "no_error_checking"
    ERROR_CHECKING = "error_checking"


def default_dtype() -> jnp.dtype:
    """fp64 when x64 is enabled (CPU tests / verification), else fp32 (TPU)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def error_dtype() -> jnp.dtype:
    """Dtype for the cancellation-prone fast-error reduction.

    The FastALS error formula (reference: src/utils/error.cpp:64-89) computes
    ``err^2 = |X|^2 + term2 - 2*term3`` where all three terms are O(|X|^2) but
    the result is tiny near convergence. We always perform this O(I_N*R + R^2)
    reduction in the widest available dtype.
    """
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@dataclasses.dataclass(frozen=True)
class AlsParams:
    """Single-model ALS parameters (reference: include/als.h:142-189)."""

    max_iterations: int = 200
    tol: float = 1e-7
    update_method: UpdateMethod = UpdateMethod.UNCONSTRAINED
    mttkrp_method: MttkrpMethod = MttkrpMethod.AUTO
    line_search: bool = False
    line_search_interval: int = 5
    line_search_step: float = 0.0  # 0 => cbrt(iteration) (reference als.cpp:252)
    line_search_method: LineSearchMethod = LineSearchMethod.NO_ERROR_CHECKING
    force_max_iter: bool = False
    # NNLS bounded iteration counts (device-friendly active-set loop).
    nnls_max_outer: int = 0  # 0 => 2*R+2
    # "bpp" (block principal pivoting — same exact solution, batched-friendly)
    # or "lawson_hanson" (the reference's one-variable active-set walk).
    nnls_algorithm: str = "bpp"
    # Matmul precision for factor-path einsums ("highest" = fp32 accum on MXU).
    precision: str = "highest"
    # MTTKRP-only precision override (None = use `precision`). The MTTKRP
    # is ~95% of iteration FLOPs; measured on the v5e, "default" (1-pass
    # bf16) runs it 4x faster than "high" (bf16_3x) at 131-192 TF/s
    # (data/benchmarks/pallas_tune.json). Fidelity vs the fp64 oracle is
    # quantified in data/benchmarks/convergence_tpu_mttkrp_default.json.
    mttkrp_precision: Optional[str] = None
    # Mixed-tier tol-driven stopping: when > 0, the per-iteration stopping
    # criterion (|fit - old_fit| < tol, reference als.cpp:273-276) is
    # replaced by periodic high-fidelity check PAIRS — at iterations mK-1
    # and mK one extra last-mode MTTKRP runs at full `precision`, so the
    # decision check holds the EXACT single-iteration high-tier fit delta
    # and the model stops when it drops below tol.
    # This is what makes the fast bf16 `mttkrp_precision` tier usable under
    # tol-driven protocols: the in-sweep bf16 fit is too noisy to resolve
    # tol=1e-6..1e-7 deltas (iteration counts inflate 5-25x), while the
    # periodic full-precision evaluation stops within ~K iterations of the
    # fp64 oracle at ~1/K relative overhead. Trajectories are unchanged —
    # only the stopping decision and the reported fit read the check.
    # 0 = off (the reference's exact per-iteration criterion).
    tol_check_interval: int = 0
    # Normal-matrix solve: "gj" (statically-unrolled Gauss-Jordan inverse,
    # fastest on TPU for the tiny [B, R, R] systems), "chol" (XLA Cholesky,
    # the reference's dpotrf+dtrsm analog), or "pallas" (lane-batched
    # Gauss-Jordan Pallas kernel; TPU-only).
    solve_method: str = "gj"
    # Per-mode epilogue (solve + normalize + gramian + error terms):
    # "auto"/"xla" = the unfused XLA path (round-5 A/B: the fused Pallas
    # kernels cost 0.65 vs 0.55 ms/iteration once the MTTKRP runs at the
    # fast tiers — 1505 vs 925 models/s end-to-end); "fused" forces the
    # validated Pallas kernels (interpret mode off-TPU, for tests).
    epilogue: str = "auto"
    # Prepared-layout HBM policy for the batched path (see
    # CalsParams.mode_layouts): "auto" | "materialized" | "recompute".
    mode_layouts: str = "auto"
    # Dimension-tree sweep (see CalsParams.dimtree).
    dimtree: str = "auto"
    # Debug oracle: warn when a model's error rises > 1e-4 between
    # iterations (reference als.cpp:233-238 warn / cals.cpp:299 assert).
    debug: bool = False


@dataclasses.dataclass(frozen=True)
class CalsParams:
    """Concurrent-ALS parameters (reference: include/cals.h:138-183).

    ``buffer_size`` (reference default 4200 columns) becomes the per-bucket
    batch capacity x rank: a bucket of capacity B and padded rank R holds
    B*R columns of the reference's multi-factor buffer.
    """

    max_iterations: int = 200
    tol: float = 1e-7
    update_method: UpdateMethod = UpdateMethod.UNCONSTRAINED
    mttkrp_method: MttkrpMethod = MttkrpMethod.AUTO
    line_search: bool = False
    line_search_interval: int = 5
    line_search_step: float = 0.0
    line_search_method: LineSearchMethod = LineSearchMethod.NO_ERROR_CHECKING
    force_max_iter: bool = False
    always_evict_first: bool = False  # defrag-stress experiment knob
    # Bucketing: ranks are padded up to the nearest bucket rank.
    bucket_ranks: tuple[int, ...] = (4, 8, 16, 32)
    # Total column budget across all buckets (analog of reference buffer_size).
    buffer_size: int = 4200
    nnls_max_outer: int = 0
    nnls_algorithm: str = "bpp"
    precision: str = "highest"
    # MTTKRP-only precision override (see AlsParams.mttkrp_precision).
    # Scope: FORCED-iteration / throughput protocols, OR tol-driven runs
    # with tol_check_interval > 0 (mixed-tier stopping). With a plain
    # per-iteration stop, bf16 noise keeps |fit - old_fit| bouncing near
    # tol and inflates iteration counts 5-25x on some models (measured,
    # data/benchmarks/convergence_tpu_mttkrp_default_polish.json), and
    # jackknife SE bands become noise-dominated (jk_fp32_vs_fp64.json) —
    # plain tol-driven and statistics runs should stay on the "high" tier.
    mttkrp_precision: Optional[str] = None
    # Mixed-tier tol-driven stopping (see AlsParams.tol_check_interval):
    # checks run in adjacent pairs at engine iterations mK-1 and mK, each
    # one extra full-`precision` last-mode MTTKRP; the decision check holds
    # the EXACT single-iteration high-tier fit delta (the reference's
    # criterion at the high tier) and models stop when it drops below tol.
    # Makes mttkrp_precision="default" safe under the reference's
    # tol-driven protocols at ~2/K relative overhead.
    # Phase note: tol-converged evictions land on check boundaries, so
    # refilled models keep checks at their OWN multiples of K (solo-ALS
    # equivalent). A max_iterations-capped eviction at a non-multiple of K
    # shifts later refills' check phase by up to K-1 iterations — a
    # decision check whose previous check is then NOT the adjacent
    # iteration falls back to the window-rate decay extrapolation
    # (iteration.py gates on gap == 1 for the exact path and on
    # gap == gap_prev for the extrapolation).
    tol_check_interval: int = 0
    # Mixed-precision refinement: when > 0 and mttkrp_precision is a lower
    # tier, models that converge at the fast tier get this many extra
    # full-`precision` ALS sweeps (masked to converged slots only) before
    # extraction — iterative refinement on the ALS fixed point. Restores
    # the bf16-tier fit deficit at negligible cost (a couple of iterations
    # per eviction round). Reported iters exclude polish sweeps; evict-mode
    # only. TPU-native extension (no reference analog).
    polish_iters: int = 0
    # Polish-to-convergence (statistics-grade fast tier, VERDICT r4 #4):
    # when > 0, polish sweeps continue until every polishing model's
    # full-precision fit delta drops below this tol (bounded by
    # polish_iters as the sweep cap) instead of running exactly
    # polish_iters sweeps. Drives every replicate to the high-tier ALS
    # fixed point before extraction, so jackknife SE bands measured on
    # fast-tier runs match the full-precision oracle's (the fixed-2-sweep
    # polish leaves bf16 trajectory scatter ~10-30x the dtype floor on
    # short modes — data/benchmarks/jk_fp32_vs_fp64.json).
    polish_tol: float = 0.0
    # Normal-matrix solve: "gj" / "chol" / "pallas" (see AlsParams).
    solve_method: str = "gj"
    # Per-mode epilogue: "auto" / "fused" / "xla" (see AlsParams).
    epilogue: str = "auto"
    # HBM policy for the per-mode prepared tensor layouts (VERDICT r4 #7;
    # the reference's implicit zero-copy unfolds, tensor.cpp:143-180,
    # became N materialized |X|-sized copies here):
    #   "materialized" — all mode layouts hoisted out of the iteration
    #     loop: ~N x |X| residency. (The twostep's tie-break already
    #     makes one cubic-tensor layout a free aliased reshape, so cubic
    #     residency is (N-1) x |X| + X.)
    #   "recompute" — layouts are re-derived INSIDE the loop each
    #     iteration (an optimization barrier pins them there, or XLA's
    #     LICM would hoist them right back): peak residency drops to
    #     ~X + one transient layout, costing ~2(N-1)|X| bytes of HBM
    #     traffic per iteration.
    #   "auto" (default) — recompute for tensors over 128 MB, else
    #     materialized. Measured at 500^3 (scale sweep, f32 = 500 MB):
    #     recompute is BOTH ~2 GB lighter and 1.58x FASTER (79.7 vs 50.4
    #     models/s — the hoisted transposes re-run per eviction-round
    #     dispatch and thrash HBM at this size), while at the 15 MB EEM
    #     shape per-iteration re-transposing would roughly double the
    #     0.27 ms iteration. 128 MB splits the two measured points
    #     (data/benchmarks/scale_sweep_layout_policy.json).
    # A krp_gemm-for-largest-mode "shared unfold" policy was considered
    # and rejected by measurement: krp_gemm runs 5-40x slower per mode on
    # TPU (VPU-bound KRP materialization, docs/PROFILE.md), dwarfing the
    # |X| it saves; force it per-mode via mttkrp_method if ever needed.
    mode_layouts: str = "auto"
    # Host-sync policy: "evict" runs a device-side while_loop that freezes
    # each model at its convergence point and returns only when something is
    # ready to evict (amortizes host round-trips, trajectories unchanged);
    # "iter" syncs every iteration like the reference's eviction scan.
    sync_mode: str = "evict"
    # Deferred eviction (sync_mode="evict"): the device loop returns only
    # once this many LIVE models have converged (or none remain
    # unconverged). 1 = return at the first convergence (the reference's
    # per-event eviction cadence, amortized per cluster). >1 keeps
    # converged models frozen on device (tree_where select — trajectories
    # stay bit-identical to immediate eviction) and batches several
    # convergence events into ONE host round trip — the tol-driven
    # protocol's binder on a tunneled chip, where each sync costs ~30-40 ms
    # while one extra engine iteration costs <1 ms. Costs: a full-state
    # select per iteration while deferring, and refill of the vacated
    # slots is delayed by the deferral window. Measured on the EEM tol
    # leg (back-to-back A/B): the default 1 WINS there — mixed-tier
    # checks already cluster convergence events at K-iteration
    # boundaries, so deferral's select+idle overhead exceeded the round
    # trips it saved. Useful when stops are per-iteration (no
    # tol_check_interval) and sync latency is high.
    evict_batch: int = 1
    # Bucket loops run in this many host threads: device compute serializes,
    # but one bucket's host work overlaps another's device work
    # (measured on the EEM bench: 1 thread 185 models/s, 2 -> 336, 4 -> ~388).
    bucket_threads: int = 4
    # Max halvings of a drained bucket's batch (tail compaction). Each
    # halving is one more compiled program shape; deeper compaction saves
    # dead-slot compute but costs compile time on cold caches.
    tail_compaction_depth: int = 2
    # Wire dtype for evicted-result factor extraction (None = the state's
    # dtype). "float16"/"bfloat16" halve the device->host result bytes —
    # on remote-attached backends the ~48 MB/s result link is the
    # end-to-end binder (docs/PROFILE.md). Device-side fits/errors are
    # unaffected (computed before the cast); only the RETURNED factor
    # values round to the wire dtype (factors are normalized columns:
    # float16 rounds at ~5e-4 relative, bfloat16 at ~4e-3 — fidelity A/B
    # in data/benchmarks/wire_ab.json). Results are cast back to the
    # queue dtype on the host.
    result_wire_dtype: Optional[str] = None
    # Dimension-tree sweep (3-D tensors): modes 1 and 2 derive their
    # MTTKRPs from ONE shared X x_0 A contraction computed after the
    # mode-0 update (PLANC's dimension-tree technique, the reference's
    # bench_mttkrp_planc.h comparison target) — 2 big TTMs per sweep
    # instead of 3, ~33% less MTTKRP compute. Gauss-Seidel-exact (A is
    # final before modes 1/2 read it; C is not re-read after its
    # update); reduction order differs from the per-mode twostep, so
    # results match it to fp-roundoff, not bitwise. "auto" (default)
    # enables it for 3-D sweeps whose MTTKRP tier is NOT the 1-pass-bf16
    # "default": interleaved A/B at B=96/R=20 on the EEM shape measured
    # 0.755x ("highest"), 0.816x ("high"), but 1.094x at "default" —
    # the bf16 tier is HBM-bound and the shared T must stay f32 (a bf16
    # T double-rounds both modes; measured 3.2e-3 mean-fit loss), so
    # its doubled traffic outweighs the FLOP savings there. "on"/"off"
    # force it; non-3-D tensors always use per-mode dispatch.
    dimtree: str = "auto"
    # Debug oracle: warn when a model's error rises > 1e-4 between
    # iterations (reference als.cpp:233-238 warn / cals.cpp:299 assert).
    debug: bool = False


def resolve_precision(name: str) -> jax.lax.Precision:
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]
