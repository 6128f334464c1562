"""Fused Khatri-Rao x matmul MTTKRP as a Pallas TPU kernel.

The XLA KRP-GEMM path (ops/mttkrp.py) materializes the packed Khatri-Rao
product [P, B*R] in HBM (for the EEM workload at full buffer: ~126 MB
written + read per mode per iteration). This kernel builds each KRP tile
on the fly in VMEM from the two factor blocks and feeds the MXU directly —
the TPU analog of the reference fusing its KRP workspace into blocked GEMMs
(/root/reference/src/utils/mttkrp.cpp:218-328), minus the HBM round-trip.

Layout: one mode-n "prepared" tensor X_n = transpose(X, (n, a, c)) padded so
that the two trailing axes tile evenly; the packed KRP column space is
(model b, rank r) and its row space is (j, k) with k minor. A KRP tile
[c_j * Kp, d_b * R] is then a contiguous reshape of
U_a[d_b, c_j, R] x U_c[d_b, Kp, R] broadcasts — no gathers, no one-hot
matmuls, pure VPU broadcast into an MXU operand.

3-D tensors only (the reference's TWOSTEP variants are also 3-D-only,
mttkrp.cpp:567); N-D falls back to the XLA path.

STATUS: validated against the XLA path in interpret mode (tests/test_pallas
.py). The tunneled TPU environment this repo is developed against cannot
compile Mosaic kernels (its remote-compile helper 500s/hangs on even a
trivial pallas_call), so compiled-mode numbers are pending real-TPU access;
the autotuner treats a failed pallas compile as a non-candidate and the
XLA packed paths remain the production route.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mttkrp_kernel(x_ref, u1_ref, u2_ref, out_ref, *, cj, kp, db, r):
    """Grid (NI, NB, NP), P innermost. Accumulates over P tiles."""
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    u1 = u1_ref[...]  # [db, cj, R]
    u2 = u2_ref[...]  # [db, Kp, R]
    # [cj, db, R] x [Kp, db, R] -> [cj, Kp, db, R] -> [(cj Kp), (db R)]
    u1_t = jnp.transpose(u1, (1, 0, 2))
    u2_t = jnp.transpose(u2, (1, 0, 2))
    krp4 = u1_t[:, None, :, :] * u2_t[None, :, :, :]
    krp = krp4.reshape(cj * kp, db * r)
    out_ref[...] += jnp.dot(
        x_ref[...], krp, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("ti", "cj", "db", "interpret")
)
def _mttkrp_pallas_call(
    x3: Array,  # [Ip, Jp, Kp] prepared (target mode first, padded)
    u1: Array,  # [Bp, Jp, R] factor of the middle axis
    u2: Array,  # [Bp, Kp, R] factor of the minor axis
    ti: int = 256,
    cj: int = 8,
    db: int = 8,
    interpret: bool = False,
) -> Array:  # [Bp, Ip, R]
    ip, jp, kp = x3.shape
    bp, _, r = u1.shape
    assert jp % cj == 0 and bp % db == 0 and ip % ti == 0
    ni, nb, np_ = ip // ti, bp // db, jp // cj
    x_mat = x3.reshape(ip, jp * kp)

    kernel = functools.partial(_mttkrp_kernel, cj=cj, kp=kp, db=db, r=r)
    out = pl.pallas_call(
        kernel,
        grid=(ni, nb, np_),
        in_specs=[
            pl.BlockSpec(
                (ti, cj * kp), lambda i, b, p: (i, p), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (db, cj, r), lambda i, b, p: (b, p, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (db, kp, r), lambda i, b, p: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (ti, db * r), lambda i, b, p: (i, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ip, bp * r), x3.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * ip * jp * kp * bp * r,
            bytes_accessed=(ip * jp * kp + bp * (jp + kp) * r + ip * bp * r) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_mat, u1, u2)
    # [Ip, Bp*R] -> [Bp, Ip, R]
    return jnp.transpose(out.reshape(ip, bp, r), (1, 0, 2))


def prepare_mode_tensor(x: Array, mode: int, ti=256, cj=8) -> Array:
    """Transpose + pad X for the fused kernel's mode-``mode`` layout.

    Done once per (tensor, mode) at engine setup — the analog of the
    reference's implicit-unfold strided views (tensor.cpp:143-180), except
    TPU prefers a materialized padded layout over strided access.
    """
    others = [m for m in range(x.ndim) if m != mode]
    x3 = jnp.transpose(x, (mode, *others))
    kp = _round_up(x3.shape[2], 8)
    cj = _pick_cj(kp, cj)
    ip = _round_up(x3.shape[0], ti)
    jp = _round_up(x3.shape[1], cj)
    return jnp.pad(
        x3,
        (
            (0, ip - x3.shape[0]),
            (0, jp - x3.shape[1]),
            (0, kp - x3.shape[2]),
        ),
    )


def _pick_db(r: int) -> int:
    """Smallest model-block count making the output lane dim (db*R) a
    multiple of 128 (Mosaic block constraint)."""
    import math

    return math.lcm(r, 128) // r


def _pick_cj(kp: int, cj: int) -> int:
    """X tile width (cj*kp) must be lane-aligned to 128, and cj itself
    sublane-aligned to 8 (it is the second-to-last dim of the U1 block)."""
    import math

    cj_min = math.lcm(math.lcm(kp, 128) // kp, 8)
    return cj_min * max(1, cj // cj_min)


def mttkrp_batched_pallas(
    x: Array,
    factors,
    mode: int,
    prepared: Array | None = None,
    ti: int = 256,
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

        return mttkrp_batched_krp(x, factors, mode)
    others = [m for m in range(3) if m != mode]
    u1, u2 = factors[others[0]], factors[others[1]]
    b, _, r = u1.shape
    if prepared is not None:
        x3 = prepared
        kp0 = _round_up(x.shape[[m for m in range(3) if m != mode][1]], 8)
        cj = _pick_cj(kp0, cj)
    else:
        kp0 = _round_up(x.shape[others[1]], 8)
        cj = _pick_cj(kp0, cj)
        x3 = prepare_mode_tensor(x, mode, ti, cj)
    ip, jp, kp = x3.shape
    if db is None:
        db = _pick_db(r)
    bp = _round_up(b, db)
    u1p = jnp.pad(u1, ((0, bp - b), (0, jp - u1.shape[1]), (0, 0)))
    u2p = jnp.pad(u2, ((0, bp - b), (0, kp - u2.shape[1]), (0, 0)))
    out = _mttkrp_pallas_call(x3, u1p, u2p, ti=ti, cj=cj, db=db,
                              interpret=interpret)
    return out[:b, : x.shape[mode], :]
