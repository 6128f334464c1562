"""Gramian and Hadamard-product ops.

TPU-native equivalent of ``cals::ops`` (`/root/reference/src/utils/utils.cpp:155-185`):
batched einsums + elementwise products that XLA fuses. Factors may carry
leading batch dims ([B, I, R]); gramians are then [B, R, R].
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def gramian(factor: Array, precision=jax.lax.Precision.HIGHEST) -> Array:
    """G = U^T U (reference utils.cpp:174-178), batched over leading dims."""
    return jnp.einsum("...ir,...is->...rs", factor, factor, precision=precision)


def gramians(factors: Sequence[Array], precision=jax.lax.Precision.HIGHEST):
    """All-mode gramians (reference utils.cpp:180-183)."""
    return tuple(gramian(f, precision) for f in factors)


def hadamard_but_one(grams: Sequence[Array], skip: int) -> Array:
    """Elementwise product of all gramians except ``skip``.

    Reference utils.cpp:161-172 (fills with ones then multiplies the rest);
    the result is the normal-equations matrix for the mode-``skip`` update.
    """
    out = None
    for n, g in enumerate(grams):
        if n == skip:
            continue
        out = g if out is None else out * g
    assert out is not None
    return out


def hadamard_all(grams: Sequence[Array]) -> Array:
    """Elementwise product of all gramians (reference utils.cpp:156-159)."""
    out = grams[0]
    for g in grams[1:]:
        out = out * g
    return out
