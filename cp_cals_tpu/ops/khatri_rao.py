"""Khatri-Rao (column-wise Kronecker) product.

TPU-native equivalent of the reference's OpenMP loops + CUDA kernel
(`/root/reference/src/utils/mttkrp.cpp:78-216`,
`/root/reference/src/utils/khatri_rao.cu`): a broadcast-multiply-reshape that
XLA fuses into the consuming matmul; no hand-written scalar loops.

Convention: ``khatri_rao(A, B)[i*JB + j, r] = A[i, r] * B[j, r]`` — A's rows
vary slowest (matches a row-major flatten of modes ordered [A-mode, B-mode]).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def khatri_rao(a: Array, b: Array) -> Array:
    """Pairwise KRP: [IA, R] x [JB, R] -> [IA*JB, R] (batched over leading dims)."""
    ia, r = a.shape[-2], a.shape[-1]
    jb = b.shape[-2]
    out = a[..., :, None, :] * b[..., None, :, :]
    return out.reshape(*out.shape[:-3], ia * jb, r)


def khatri_rao_chain(factors: Sequence[Array]) -> Array:
    """KRP of a list of factors, first factor's rows varying slowest.

    Equivalent to the reference's recursive pairwise chain through workspace
    buffers (src/utils/mttkrp.cpp:146-216); here the chain is a fold that XLA
    fuses — no workspace ladder needed.
    """
    return reduce(khatri_rao, factors)
