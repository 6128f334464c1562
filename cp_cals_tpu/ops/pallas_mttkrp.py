"""Fused twostep MTTKRP as a Pallas TPU kernel.

The XLA twostep path (ops/mttkrp.py:210-243) contracts the big non-target
mode with one MXU matmul into a [I_n * I_small, B*R] intermediate in HBM
(~94 MB written + read per mode per iteration on the EEM workload at
B*R = 1920), then reduces the small mode on the VPU. This kernel fuses the
two steps: each grid cell computes the TTM for a [ti, Kb] tensor tile
directly in VMEM and folds the small-mode factor in before anything
touches HBM — the TPU analog of the reference keeping its TWOSTEP
intermediate in cache-blocked GEMMs (/root/reference/src/utils/
mttkrp.cpp:330-448), minus the HBM round-trip.

Decomposition per output tile (n = target row, b = model, r = rank):

    G[n, (b r)] = sum_j U1[j, (b r)] * (sum_k X[j, n, k] * U2[k, (b r)])

The inner contraction is one MXU dot per small-mode index j (a static
in-kernel unroll over the cj indices of this grid step); the outer
weighted sum is a VPU multiply-accumulate. All operands use lane-packed
[*, B*R] layouts and only leading-dimension slicing, which Mosaic lowers
without relayouts (multi-axis reshapes of tiled vectors are unsupported).

3-D tensors only (the reference's TWOSTEP variants are also 3-D-only,
mttkrp.cpp:567); N-D falls back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Row-tile cap: tiles of the target mode larger than this are split so the
# X block (ti * cj * Kb floats) stays well inside VMEM double-buffering.
_TI_CAP = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_ti(ip8: int) -> tuple[int, int]:
    """(ti, padded Ip): one whole tile when the mode is small, else 256."""
    if ip8 <= _TI_CAP:
        return ip8, ip8
    return 256, _round_up(ip8, 256)


def _pick_db(r: int) -> int:
    """Smallest model-block count making the packed lane dim (db*R) a
    multiple of 128 (Mosaic lane-tile constraint)."""
    import math

    return math.lcm(r, 128) // r


def pallas_mttkrp_supported(
    x_shape, mode: int, b: int, r: int, cj: int = 8
) -> bool:
    """Static scoped-VMEM feasibility gate for the fused kernel.

    Estimates the per-grid-cell working set (double-buffered X tile +
    factor/output blocks) against the ~16 MB Mosaic scoped-VMEM limit with
    a 1.5x safety factor for compiler temporaries (measured: 500^3 at
    r=20 allocates 16.73 MB where this base formula gives ~12 MB). Callers
    fall back to the XLA twostep when False."""
    if len(x_shape) != 3:
        return False
    small, big = _split_others(tuple(x_shape), mode)
    kbp = _round_up(x_shape[big], 8)
    jsp = _round_up(x_shape[small], cj)
    ip8 = _round_up(x_shape[mode], 8)
    ti, _ = _pick_ti(ip8)
    dbr = _pick_db(r) * r
    base = 4 * (
        2 * cj * ti * kbp        # x tile, double-buffered
        + 2 * kbp * dbr          # u2 block
        + 2 * min(cj, jsp) * dbr # u1 block
        + 2 * ti * dbr           # out block
    )
    return base * 1.5 <= 16 * 1024 * 1024


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


_DOT_DIMS = (((1,), (0,)), ((), ()))


def _mttkrp_kernel(x_ref, u2_ref, u1_ref, out_ref, *, cj, prec):
    """Grid (NI, NB, NJ), J innermost (accumulated).

    x_ref:   [cj, ti, Kb]  tensor tile, small mode leading
    u2_ref:  [Kb, db*R]    big-mode factor, lane-packed
    u1_ref:  [cj, db*R]    small-mode factor, lane-packed
    out_ref: [ti, db*R]

    prec: "highest" -> Mosaic HIGHEST f32 dot; "high" -> manual bf16_3x
    (hi/lo split, 3 MXU passes — Mosaic has no native HIGH); "default" ->
    single-pass bf16.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    u2 = u2_ref[...]
    if prec == "high":
        u2h, u2l = _bf16_split(u2)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for jj in range(cj):
        xj = x_ref[jj]
        if prec == "high":
            xh, xl = _bf16_split(xj)
            w = jax.lax.dot_general(
                xh, u2h, _DOT_DIMS, preferred_element_type=jnp.float32
            )
            w += jax.lax.dot_general(
                xh, u2l, _DOT_DIMS, preferred_element_type=jnp.float32
            )
            w += jax.lax.dot_general(
                xl, u2h, _DOT_DIMS, preferred_element_type=jnp.float32
            )
        elif prec == "default":
            w = jax.lax.dot_general(
                xj.astype(jnp.bfloat16),
                u2.astype(jnp.bfloat16),
                _DOT_DIMS,
                preferred_element_type=jnp.float32,
            )
        else:
            w = jax.lax.dot_general(
                xj,
                u2,
                _DOT_DIMS,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        acc = acc + w * u1_ref[jj][None, :]
    out_ref[...] += acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("ti", "cj", "db", "precision", "interpret")
)
def _mttkrp_pallas_call(
    x3: Array,  # [Jsp, Ip, Kbp] prepared (small mode, target mode, big mode)
    u1m: Array,  # [Jsp, Bp*R] small-mode factor, lane-packed
    u2m: Array,  # [Kbp, Bp*R] big-mode factor, lane-packed
    ti: int,
    cj: int,
    db: int,
    precision: str = "highest",
    interpret: bool = False,
) -> Array:  # [Ip, Bp*R]
    jsp, ip, kbp = x3.shape
    bpr = u1m.shape[1]
    dbr = db  # packed column-block width (db models x R ranks)
    assert ip % ti == 0 and jsp % cj == 0 and bpr % dbr == 0
    ni, nb, nj = ip // ti, bpr // dbr, jsp // cj

    kernel = functools.partial(_mttkrp_kernel, cj=cj, prec=precision)
    out = pl.pallas_call(
        kernel,
        grid=(ni, nb, nj),
        in_specs=[
            pl.BlockSpec(
                (cj, ti, kbp), lambda i, b, j: (j, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kbp, dbr), lambda i, b, j: (0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cj, dbr), lambda i, b, j: (j, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (ti, dbr), lambda i, b, j: (i, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ip, bpr), x3.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * ip * jsp * kbp * bpr,
            bytes_accessed=(ip * jsp * kbp + (jsp + kbp + ip) * bpr) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x3, u2m, u1m)
    return out


def _split_others(shape: tuple, mode: int) -> tuple[int, int]:
    """(small, big) non-target modes — big is the MXU contraction axis."""
    others = [m for m in range(3) if m != mode]
    big = max(others, key=lambda m: shape[m])
    small = [m for m in others if m != big][0]
    return small, big


def prepare_mode_tensor(x: Array, mode: int, ti: int | None = None,
                        cj: int = 8) -> Array:
    """Transpose + pad X to the kernel's [Jsp, Ip, Kbp] mode layout.

    Done once per (tensor, mode) at engine setup — the analog of the
    reference's implicit-unfold strided views (tensor.cpp:143-180), except
    TPU prefers a materialized padded layout over strided access.
    """
    small, big = _split_others(x.shape, mode)
    x3 = jnp.transpose(x, (small, mode, big))
    jsp = _round_up(x3.shape[0], cj)
    if ti is None:
        _, ip = _pick_ti(_round_up(x3.shape[1], 8))
    else:
        ip = _round_up(x3.shape[1], ti)
    kbp = _round_up(x3.shape[2], 8)
    return jnp.pad(
        x3,
        (
            (0, jsp - x3.shape[0]),
            (0, ip - x3.shape[1]),
            (0, kbp - x3.shape[2]),
        ),
    )


def _packed_factor(f: Array, rows: int, bp: int) -> Array:
    """[B, I, R] -> lane-packed [rows, Bp*R] with zero padding."""
    b, i, r = f.shape
    fm = jnp.transpose(f, (1, 0, 2))  # [I, B, R]
    fm = jnp.pad(fm, ((0, rows - i), (0, bp - b), (0, 0)))
    return fm.reshape(rows, bp * r)


def mttkrp_batched_pallas(
    x: Array,
    factors,
    mode: int,
    prepared: Array | None = None,
    precision="highest",
    ti: int | None = None,
    cj: int = 8,
    db: int | None = None,
    interpret: bool = False,
) -> Array:
    """Batched fused MTTKRP. factors: per-mode [B, I_m, R]; returns [B, I_n, R].

    ``prepared`` may carry the pre-padded mode tensor from
    ``prepare_mode_tensor`` to skip the per-call transpose/pad.
    """
    if x.ndim != 3:
        from .mttkrp import mttkrp_batched_krp

        return mttkrp_batched_krp(x, factors, mode, precision)
    small, big = _split_others(x.shape, mode)
    u1, u2 = factors[small], factors[big]
    b, _, r = u1.shape
    if db is None and not pallas_mttkrp_supported(x.shape, mode, b, r, cj):
        # Working set exceeds Mosaic's scoped-VMEM limit at this shape
        # (e.g. 500^3 at r=20): use the XLA twostep instead of failing to
        # compile. Explicit db overrides skip the gate (benchmarks).
        from .mttkrp import mttkrp_batched_twostep

        return mttkrp_batched_twostep(x, factors, mode, precision, None)
    x3 = prepared if prepared is not None else prepare_mode_tensor(
        x, mode, ti, cj
    )
    jsp, ip, kbp = x3.shape
    if jsp % cj:  # prepared layout from a different cj: re-pad the small axis
        x3 = jnp.pad(x3, ((0, _round_up(jsp, cj) - jsp), (0, 0), (0, 0)))
        jsp = x3.shape[0]
    if ti is None:
        ti = _pick_ti(ip)[0]
    if ip % ti:  # prepared layout from a different ti: re-pad the target axis
        x3 = jnp.pad(x3, ((0, 0), (0, _round_up(ip, ti) - ip), (0, 0)))
        ip = x3.shape[1]
    if db is None:
        db = _pick_db(r)
    bp = _round_up(b, db)
    u1m = _packed_factor(u1, jsp, bp)
    u2m = _packed_factor(u2, kbp, bp)
    prec = {
        jax.lax.Precision.HIGHEST: "highest",
        jax.lax.Precision.HIGH: "high",
        jax.lax.Precision.DEFAULT: "default",
    }.get(precision, precision if isinstance(precision, str) else "highest")
    out = _mttkrp_pallas_call(
        x3, u1m, u2m, ti=ti, cj=cj, db=db * r, precision=prec,
        interpret=interpret,
    )
    # [Ip, Bp*R] -> [B, I_n, R]
    out = out.reshape(ip, bp, r)
    return jnp.transpose(out, (1, 0, 2))[:b, : x.shape[mode], :]
