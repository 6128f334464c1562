"""Batched small-SPD inverse as a Pallas TPU kernel.

The CALS factor update inverts one tiny [R, R] normal matrix per model
(R <= ~20, B ~ 100 models). XLA's `lax.linalg.cholesky` +
`triangular_solve` are blocked column-loop algorithms built for large
single matrices; on [B, 20, 20] batches they are latency-bound (~0.2 ms
for work whose FLOPs are ~1 us). This kernel lays the batch across VPU
*lanes* ([R, R, B] layout) so one statically-unrolled Gauss-Jordan
elimination runs B models wide per vector op — the whole inverse is a few
hundred vector instructions in VMEM with no serialized device loops.

No pivoting: SPD pivots are positive Schur-complement diagonals (same
stability class as the reference's unpivoted dpotrf, update.cpp:178-186).

Used by `ops/update.py` when running on TPU; the XLA unrolled Gauss-Jordan
(`gj_inverse`) is the everywhere-else path and the numerical oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gj_kernel(h_ref, out_ref, *, r):
    """h_ref/out_ref: [R, R, LB] — models on lanes.

    Padded lane columns carry the identity matrix (see wrapper), so their
    pivots are 1 and the elimination is a no-op there.
    """
    a = h_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, r, 1), 1)
    inv = jnp.where(row == col, jnp.ones_like(a), jnp.zeros_like(a))
    for j in range(r):
        rd = 1.0 / a[j, j, :]  # [LB]
        arow = a[j] * rd[None, :]  # [R, LB]
        irow = inv[j] * rd[None, :]
        cj = a[:, j, :]  # [R, LB]
        is_j = row == j
        a = jnp.where(is_j, arow[None], a - cj[:, None, :] * arow[None])
        inv = jnp.where(is_j, irow[None], inv - cj[:, None, :] * irow[None])
    out_ref[...] = inv


@functools.partial(jax.jit, static_argnames=("interpret",))
def spd_inverse_pallas(h: Array, interpret: bool = False) -> Array:
    """Inverse of a batched SPD matrix. h: [B, R, R] -> [B, R, R]."""
    b, r, _ = h.shape
    bp = _round_up(b, _LANES)
    hm = jnp.transpose(h, (1, 2, 0))  # [R, R, B]
    if bp != b:
        # Identity padding keeps the unpivoted elimination well-defined on
        # the dead lanes.
        pad = jnp.broadcast_to(
            jnp.eye(r, dtype=h.dtype)[:, :, None], (r, r, bp - b)
        )
        hm = jnp.concatenate([hm, pad], axis=2)
    out = pl.pallas_call(
        functools.partial(_gj_kernel, r=r),
        grid=(bp // _LANES,),
        in_specs=[
            pl.BlockSpec((r, r, _LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((r, r, _LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, r, bp), h.dtype),
        interpret=interpret,
    )(hm)
    return jnp.transpose(out[:, :, :b], (2, 0, 1))
