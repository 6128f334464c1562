"""Ktensor: the CP model (factor matrices + column weights) as a JAX pytree.

TPU-native re-design of the reference ``cals::Ktensor``
(`/root/reference/include/ktensor.h:24-47`, `/root/reference/src/ktensor.cpp`).
The reference is a mutable C++ object with attach/detach pointer machinery for
the shared multi-factor buffer; here a Ktensor is an immutable pytree of
arrays and all mutation is functional. The multi-buffer machinery is replaced
by rank-padded batched arrays (see ``solvers/cals.py``); padded columns are
exactly zero with zero weight, which makes them algebraically inert in every
kernel (MTTKRP, gramians, error) — the TPU analog of detached buffer columns.
"""

from __future__ import annotations

import string
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


class Ktensor(NamedTuple):
    """CP model: ``X ~= sum_r lam[r] * outer(factors[0][:,r], ...)``.

    factors: tuple of [I_n, R] arrays (one per tensor mode).
    lam:     [R] column weights.
    """

    factors: tuple[Array, ...]
    lam: Array

    @property
    def rank(self) -> int:
        return self.lam.shape[-1]

    @property
    def n_modes(self) -> int:
        return len(self.factors)

    @property
    def modes(self) -> tuple[int, ...]:
        return tuple(f.shape[-2] for f in self.factors)


class RandomKtensorSpec(NamedTuple):
    """A queue entry that says "random initial guess, generated ON DEVICE".

    The reference driver builds its randomized initial models host-side
    (src/examples/driver.cpp:115-150, Tensor::randomize) because its compute
    IS the host; the TPU-native equivalent generates them on the accelerator,
    so a model queue of specs uploads nothing but seeds. Semantics are
    deterministic and padding-independent: column ``j`` of mode ``n`` is
    ``uniform(fold_in(fold_in(PRNGKey(seed), n), j), (I_n,), -1, 1)``
    followed by full normalization (see ``spec_to_ktensor``) — the same
    model regardless of which rank bucket the engine packs it into.
    """

    modes: tuple[int, ...]
    rank: int
    seed: int
    dtype: str | None = None

    @property
    def n_modes(self) -> int:
        return len(self.modes)


def _spec_columns(key: Array, mode_idx: int, m: int, r: int, dtype) -> Array:
    """[m, r] uniform(-1,1) factor with one fold_in-derived key per column —
    the per-column keying makes the values independent of the array's padded
    width, so batched (bucket-padded) and single-model generation agree."""
    kn = jax.random.fold_in(key, mode_idx)
    cols = jax.vmap(
        lambda j: jax.random.uniform(
            jax.random.fold_in(kn, j), (m,), dtype=dtype, minval=-1.0, maxval=1.0
        )
    )(jnp.arange(r))
    return cols.T


def spec_to_ktensor(spec: RandomKtensorSpec) -> Ktensor:
    """Materialize a ``RandomKtensorSpec`` (device-side, jittable)."""
    from .config import default_dtype

    dtype = jnp.dtype(spec.dtype) if spec.dtype else default_dtype()
    key = jax.random.PRNGKey(spec.seed)
    factors = tuple(
        _spec_columns(key, n, m, spec.rank, dtype)
        for n, m in enumerate(spec.modes)
    )
    return normalize_full(Ktensor(factors, jnp.ones((spec.rank,), dtype)))


def random_ktensor_host(
    rng, modes: Sequence[int], rank: int, dtype=None
) -> Ktensor:
    """Host-side (NumPy) random Ktensor: uniform(-1,1) factors, full
    normalization — same math as ``random_ktensor`` without touching a
    device. Use for building model queues: accelerator-backed queue models
    force one device->host round-trip per factor at pack time, which
    dominates startup on remote-attached TPUs.

    rng: a ``numpy.random.Generator`` (or an int seed).
    """
    import numpy as np

    from .config import default_dtype

    if isinstance(rng, (int, np.integer)):
        rng = np.random.default_rng(int(rng))
    if dtype is None:
        dtype = default_dtype()
    dtype = np.dtype(jnp.dtype(dtype).name)
    factors = []
    lam = np.ones(rank, dtype)
    for m in modes:
        f = rng.uniform(-1.0, 1.0, size=(m, rank)).astype(dtype)
        coeff = np.linalg.norm(f, axis=0)
        safe = np.where(coeff != 0, coeff, 1.0)
        factors.append(f / safe)
        lam = lam * coeff.astype(dtype)
    return Ktensor(tuple(factors), lam)


def to_host(kt: Ktensor) -> Ktensor:
    """Pull a (possibly device-backed) Ktensor to host NumPy arrays."""
    import numpy as np

    return Ktensor(
        tuple(np.asarray(f) for f in kt.factors), np.asarray(kt.lam)
    )


def random_ktensor(
    key: Array, modes: Sequence[int], rank: int, dtype=None
) -> Ktensor:
    """Uniform(-1,1) factors, then full normalization.

    Mirrors ``Ktensor::randomize`` (reference src/ktensor.cpp:10-19 +
    src/tensor.cpp:122-129: uniform [-1, 1]).
    """
    from .config import default_dtype

    dtype = dtype or default_dtype()
    keys = jax.random.split(key, len(modes))
    factors = tuple(
        jax.random.uniform(k, (m, rank), dtype=dtype, minval=-1.0, maxval=1.0)
        for k, m in zip(keys, modes)
    )
    lam = jnp.ones((rank,), dtype=dtype)
    return normalize_full(Ktensor(factors, lam))


def normalize_full(kt: Ktensor) -> Ktensor:
    """Per-column L2 normalization of every factor; weights accumulate into lam.

    Mirrors ``Ktensor::normalize()`` (reference src/ktensor.cpp:85-99).
    Zero columns (rank padding) are left untouched with lam = 0 — the
    reference divides by zero here but never has zero columns; guarding keeps
    padded slots algebraically inert.
    """
    lam = jnp.ones_like(kt.lam)
    new_factors = []
    for f in kt.factors:
        coeff = jnp.linalg.norm(f, axis=-2)  # [R]
        safe = jnp.where(coeff != 0, coeff, 1.0)
        new_factors.append(f / safe[..., None, :])
        lam = lam * coeff
    return Ktensor(tuple(new_factors), lam)


def normalize_mode(kt: Ktensor, mode: int, iteration: Array | int) -> Ktensor:
    """Normalize one factor; norm choice depends on the ALS iteration.

    Mirrors ``Ktensor::normalize(mode, iteration)`` (reference
    src/ktensor.cpp:66-83): iteration 1 uses the L2 column norm, later
    iterations use the *signed* entry of maximum magnitude (idamax semantics).
    Columns with zero weight are not scaled (reference: ``if (lambda != 0)``).
    """
    f = kt.factors[mode]
    l2 = jnp.linalg.norm(f, axis=-2)
    # Signed entry of maximum magnitude, gather-free: compare the column max
    # against the column min (gathers on TPU cost ~a full elementwise pass).
    # Tie |max| == |min| picks the max — idamax would pick whichever comes
    # first; the difference only flips a column sign in exact ties.
    mx = jnp.max(f, axis=-2)
    mn = jnp.min(f, axis=-2)
    maxval = jnp.where(mx >= -mn, mx, mn)
    is_first = (jnp.asarray(iteration) == 1)[..., None]  # broadcast over R
    lam_new = jnp.where(is_first, l2, maxval)
    safe = jnp.where(lam_new != 0, lam_new, 1.0)
    f_new = f / safe[..., None, :]
    factors = kt.factors[:mode] + (f_new,) + kt.factors[mode + 1 :]
    return Ktensor(factors, lam_new.astype(kt.lam.dtype))


def normalize_factor_fused(
    f: Array, iteration: Array | int, precision=jax.lax.Precision.HIGHEST
) -> tuple[Array, Array, Array]:
    """``normalize_mode`` + the normalized factor's gramian, in one pass.

    Returns (normalized factor, new lam, gramian of the normalized factor).
    Same semantics as ``normalize_mode(kt, n, iteration)`` followed by
    ``gramian(kt.factors[n])`` (reference ktensor.cpp:66-83 +
    utils.cpp:174-178), restructured so the iteration-1 L2 column norms come
    from the raw gramian's diagonal (already a matmul byproduct) and the
    normalized gramian is a rank-1 rescale of the raw one instead of a second
    matmul. Reconstruction is invariant to the scale split between factor and
    lam, so the fp difference vs the unfused path is at matmul-rounding level.
    Measured 2-8x faster than the unfused pair on TPU at the bench shapes
    (data/benchmarks/update_variants.json).
    """
    from .ops.gramians import gramian

    gm_raw = gramian(f, precision)
    l2 = jnp.sqrt(jnp.abs(jnp.diagonal(gm_raw, axis1=-2, axis2=-1)))
    mx = jnp.max(f, axis=-2)
    mn = jnp.min(f, axis=-2)
    maxval = jnp.where(mx >= -mn, mx, mn)  # signed max magnitude (idamax)
    is_first = (jnp.asarray(iteration) == 1)[..., None]
    lam_new = jnp.where(is_first, l2, maxval).astype(f.dtype)
    safe = jnp.where(lam_new != 0, lam_new, 1.0)
    f_new = f / safe[..., None, :]
    gm = gm_raw / (safe[..., :, None] * safe[..., None, :])
    return f_new, lam_new, gm


def denormalize(kt: Ktensor) -> Ktensor:
    """Fold lam into factor 0 (reference src/ktensor.cpp:101-107)."""
    f0 = kt.factors[0] * kt.lam[..., None, :]
    return Ktensor((f0,) + kt.factors[1:], jnp.ones_like(kt.lam))


def to_tensor(kt: Ktensor, precision=jax.lax.Precision.HIGHEST) -> Array:
    """Dense reconstruction ``X[i0..iN] = sum_r lam[r] prod_n U_n[i_n, r]``.

    TPU-shaped equivalent of the recursive scalar loop in the reference
    (src/ktensor.cpp:32-64): one einsum, which XLA lowers to MXU matmuls.
    """
    n = kt.n_modes
    idx = string.ascii_lowercase[:n]
    operands = []
    subs = []
    for i, f in enumerate(kt.factors):
        operands.append(f)
        subs.append(f"{idx[i]}r")
    lam_sub = "r"
    expr = ",".join(subs + [lam_sub]) + "->" + idx
    return jnp.einsum(expr, *operands, kt.lam, precision=precision)


def scale_jk_rows(f0: Array, fiber: Array | int, value: float = 0.0) -> Array:
    """Scale row ``fiber`` of a mode-0 factor array (jackknife masked sample).

    ``fiber < 0`` means "not a jackknife model" — no-op, which lets the
    batched engine apply this uniformly with a mask.
    """
    rows = f0.shape[-2]
    fiber = jnp.asarray(fiber)
    row_ids = jnp.arange(rows)
    # [..., I0]: which row is the jackknifed fiber of each model
    hit = (row_ids == fiber[..., None]) & (fiber >= 0)[..., None]
    return jnp.where(hit[..., None], f0 * value, f0)


def set_jk_fiber(kt: Ktensor, fiber: Array | int, value: float = 0.0) -> Ktensor:
    """Scale row ``fiber`` of the mode-0 factor (the jackknife masked sample).

    Mirrors ``Ktensor::set_jk_fiber`` (reference include/ktensor.h:316-325)
    for the scale case.
    """
    f0_new = scale_jk_rows(kt.factors[0], fiber, value)
    return Ktensor((f0_new,) + kt.factors[1:], kt.lam)


def jk_to_regular(kt: Ktensor, fiber: int) -> Ktensor:
    """Drop the jackknifed row of factor 0 -> (I0-1)-row model.

    Mirrors ``Ktensor::to_regular`` (reference include/ktensor.h:284-314).
    Host-side utility (dynamic shape), used when exporting jackknife results.
    """
    f0 = kt.factors[0]
    f0_new = jnp.concatenate([f0[..., :fiber, :], f0[..., fiber + 1 :, :]], axis=-2)
    return Ktensor((f0_new,) + kt.factors[1:], kt.lam)


def pad_rank(kt: Ktensor, target_rank: int) -> Ktensor:
    """Zero-pad factor columns and lam up to ``target_rank`` (bucket padding)."""
    r = kt.rank
    if r == target_rank:
        return kt
    if r > target_rank:
        raise ValueError(f"rank {r} > bucket rank {target_rank}")
    pad = target_rank - r
    factors = tuple(
        jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(0, pad)]) for f in kt.factors
    )
    lam = jnp.pad(kt.lam, [(0, 0)] * (kt.lam.ndim - 1) + [(0, pad)])
    return Ktensor(factors, lam)


def truncate_rank(kt: Ktensor, rank: int) -> Ktensor:
    """Drop padded columns (inverse of ``pad_rank``)."""
    factors = tuple(f[..., :rank] for f in kt.factors)
    return Ktensor(factors, kt.lam[..., :rank])


def concatenate_ktensors(kts: Sequence[Ktensor]) -> Ktensor:
    """Column-concatenate same-shape models into one wide Ktensor
    (reference utils.cpp:18-38 ``concatenate_ktensors``)."""
    factors = tuple(
        jnp.concatenate([kt.factors[m] for kt in kts], axis=-1)
        for m in range(kts[0].n_modes)
    )
    lam = jnp.concatenate([kt.lam for kt in kts], axis=-1)
    return Ktensor(factors, lam)
