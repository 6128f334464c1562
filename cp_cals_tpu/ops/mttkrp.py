"""MTTKRP — Matricized Tensor Times Khatri-Rao Product — the hot kernel.

TPU-native re-design of the reference's three BLAS variants + dispatch
(`/root/reference/src/utils/mttkrp.cpp:218-614`):

* ``KRP_GEMM``  — materialize the Khatri-Rao product of the non-target
  factors, then ONE large MXU matmul against the mode-n unfolding. This is
  the reference's ``mttkrp_impl`` (mttkrp.cpp:218-328) reshaped for XLA: the
  "implicit unfolding" block-GEMM machinery collapses into a transpose that
  XLA folds into the dot.
* ``TWOSTEP``   — contract the tensor with one factor at a time
  (TTM, then TTV per remaining mode), never materializing the KRP. This is
  the reference's ``mttkrp_twostep`` (mttkrp.cpp:330-560); on TPU each step
  is itself an MXU contraction instead of GEMV sweeps.
* ``PALLAS``    — fused KRP-matmul kernel (see ``ops/pallas_mttkrp.py``):
  KRP tiles are built on the fly in VMEM, nothing KRP-sized touches HBM.
* ``AUTO``      — LUT/heuristic dispatch (the reference reads per-shape
  lookup tables, mttkrp.cpp:562-614; we autotune per (shape, rank) and
  cache — see ``utils/lut.py``).

Batched ("CALS") forms take factors with a leading model-batch axis
[B, I_n, R] and share one tensor: the KRP path becomes a single
``[I_n, P] x [P, B*R]`` matmul — exactly the reference's trick of packing
all concurrent models' columns into one GEMM (src/cals.cpp:225), realized
as an einsum the MXU tiles natively.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .khatri_rao import khatri_rao_chain

Array = jax.Array


def _others(n_modes: int, mode: int) -> list[int]:
    return [m for m in range(n_modes) if m != mode]


def _unfold(x: Array, mode: int) -> Array:
    """Mode-n unfolding [I_n, prod(I_m, m != n)], remaining modes in
    ascending order (rows of the first remaining mode vary slowest — the
    layout matched by ``khatri_rao_chain`` over ascending non-target modes)."""
    others = _others(x.ndim, mode)
    return jnp.transpose(x, (mode, *others)).reshape(x.shape[mode], -1)


# ---------------------------------------------------------------------------
# Single-model variants
# ---------------------------------------------------------------------------


def mttkrp_krp_gemm(
    x: Array,
    factors: Sequence[Array],
    mode: int,
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    """G = X_(n) @ KRP(others): one big matmul."""
    others = _others(x.ndim, mode)
    krp = khatri_rao_chain([factors[m] for m in others])  # [P, R]
    return jnp.matmul(_unfold(x, mode), krp, precision=precision)


def mttkrp_twostep(
    x: Array,
    factors: Sequence[Array],
    mode: int,
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    """Sequence of single-factor contractions, largest mode first.

    Contracting the largest non-target mode first shrinks the intermediate
    fastest — the reference's TWOSTEP0/1 choice (mttkrp.cpp:450-560) made
    automatic.
    """
    others = _others(x.ndim, mode)
    order = sorted(others, key=lambda m: -x.shape[m])
    # First contraction: tensor x factor -> intermediate with trailing R.
    m0 = order[0]
    t = jnp.tensordot(x, factors[m0], axes=([m0], [0]), precision=precision)
    # t axes: original modes except m0 (order preserved), then R.
    live = [m for m in range(x.ndim) if m != m0]
    for m in order[1:]:
        ax = live.index(m)
        # Contract t's axis `ax` with factor m, elementwise in R:
        # t[..., j, ..., r] * U[j, r] summed over j.
        t = jnp.einsum(
            t,
            list(range(t.ndim)),
            factors[m],
            [ax, t.ndim - 1],
            [i for i in range(t.ndim) if i != ax],
            precision=precision,
        )
        live.pop(ax)
    return t  # [I_mode, R]


def mttkrp(
    x: Array,
    factors: Sequence[Array],
    mode: int,
    method: str = "krp_gemm",
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    if method in ("krp_gemm", "auto"):
        return mttkrp_krp_gemm(x, factors, mode, precision)
    if method == "twostep":
        return mttkrp_twostep(x, factors, mode, precision)
    raise ValueError(f"unknown mttkrp method {method!r}")


# ---------------------------------------------------------------------------
# Batched ("CALS") variants: factors [B, I_n, R], shared tensor
# ---------------------------------------------------------------------------


def mttkrp_batched_krp(
    x: Array,
    factors: Sequence[Array],
    mode: int,
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    """[B, I_n, R] result via one [I_n, P] x [P, B*R] MXU matmul."""
    others = _others(x.ndim, mode)
    krp = khatri_rao_chain([factors[m] for m in others])  # [B, P, R]
    b, p, r = krp.shape
    krp2 = jnp.transpose(krp, (1, 0, 2)).reshape(p, b * r)
    g = jnp.matmul(_unfold(x, mode), krp2, precision=precision)  # [I_n, B*R]
    return jnp.transpose(g.reshape(x.shape[mode], b, r), (1, 0, 2))


def mttkrp_batched_twostep(
    x: Array,
    factors: Sequence[Array],
    mode: int,
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    """Largest-mode-first contraction chain with a model-batch axis.

    Intermediate is [B, prod(small modes), R] — cheaper than the KRP when the
    contracted mode is large, costlier in memory when B is large; the
    autotuner picks per shape.
    """
    others = _others(x.ndim, mode)
    order = sorted(others, key=lambda m: -x.shape[m])
    m0 = order[0]
    # t[b, (modes except m0), r]
    t = jnp.einsum(
        x,
        list(range(x.ndim)),
        factors[m0],
        [x.ndim, m0, x.ndim + 1],
        [x.ndim] + [i for i in range(x.ndim) if i != m0] + [x.ndim + 1],
        precision=precision,
    )
    live = [m for m in range(x.ndim) if m != m0]
    for m in order[1:]:
        ax = live.index(m) + 1  # +1 for batch axis
        t = jnp.einsum(
            t,
            list(range(t.ndim)),
            factors[m],
            [0, ax, t.ndim - 1],
            [i for i in range(t.ndim) if i != ax],
            precision=precision,
        )
        live.pop(ax - 1)
    return t  # [B, I_mode, R]


def mttkrp_batched(
    x: Array,
    factors: Sequence[Array],
    mode: int,
    method: str = "krp_gemm",
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    if method == "pallas":
        from .pallas_mttkrp import mttkrp_batched_pallas

        return mttkrp_batched_pallas(x, factors, mode)
    if method in ("krp_gemm", "auto"):
        return mttkrp_batched_krp(x, factors, mode, precision)
    if method == "twostep":
        return mttkrp_batched_twostep(x, factors, mode, precision)
    raise ValueError(f"unknown mttkrp method {method!r}")


# ---------------------------------------------------------------------------
# FLOP accounting (analog of reference mttkrp.cpp:316-325,436-445)
# ---------------------------------------------------------------------------


def mttkrp_flops(modes: Sequence[int], rank: int, mode: int, batch: int = 1) -> int:
    """FLOPs for the KRP-GEMM formulation of one batched MTTKRP."""
    p = int(np.prod([m for i, m in enumerate(modes) if i != mode]))
    krp = p * rank * batch  # multiplies to build the KRP
    gemm = 2 * modes[mode] * p * rank * batch
    return krp + gemm


def als_iteration_flops(modes: Sequence[int], rank: int, batch: int = 1) -> int:
    """FLOPs for one full ALS iteration (all-mode MTTKRPs + updates)."""
    total = 0
    for n in range(len(modes)):
        total += mttkrp_flops(modes, rank, n, batch)
        # gramian + cholesky + trsm per mode (small): I*R^2 + R^3/3 + 2*I*R^2
        total += batch * (3 * modes[n] * rank * rank + rank**3 // 3)
    return total
