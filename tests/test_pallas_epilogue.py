"""Fused Pallas epilogue kernels vs the XLA oracle path (interpret mode).

Covers ops/pallas_epilogue.py: the lane-batched hadamard+inverse kernel,
the per-model-block apply+normalize+gramian kernel (incl. jackknife row
zeroing, iteration-1 L2 vs later signed-max normalization, padded columns),
the double-float error column sums, and the full iteration equivalence
with params.epilogue="fused" vs "xla".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cp_cals_tpu.ktensor import Ktensor, normalize_factor_fused, scale_jk_rows
from cp_cals_tpu.ops.error import fast_error, fast_error_from_cols
from cp_cals_tpu.ops.gramians import gramians, hadamard_all, hadamard_but_one
from cp_cals_tpu.ops.pallas_epilogue import (
    epilogue_apply_pallas,
    normal_inverse_pallas,
    supports_fused_epilogue,
)
from cp_cals_tpu.ops.update import padded_hadamard, update_factor_unconstrained

F32 = jnp.float32


def _random_problem(b=6, modes=(9, 8, 7), r=5, pad=0, seed=0):
    rng = np.random.default_rng(seed)
    rr = r + pad
    factors = []
    for m in modes:
        f = rng.normal(size=(b, m, rr)).astype(np.float32)
        f[..., r:] = 0.0
        factors.append(jnp.asarray(f))
    mask = jnp.asarray(
        np.arange(rr)[None, :] < r, bool
    ) * jnp.ones((b, 1), bool)
    g = jnp.asarray(rng.normal(size=(b, modes[1], rr)).astype(np.float32))
    g = g * mask[:, None, :]
    return factors, mask, g


def test_normal_inverse_matches_xla():
    factors, mask, _ = _random_problem(pad=2)
    grams = gramians(tuple(f.astype(F32) for f in factors))
    for skip in range(3):
        h = padded_hadamard(hadamard_but_one(grams, skip), mask)
        hinv_ref = jnp.linalg.inv(h.astype(jnp.float64))
        hinv = normal_inverse_pallas(grams, mask, skip, interpret=True)
        np.testing.assert_allclose(
            np.asarray(hinv), np.asarray(hinv_ref), rtol=2e-4, atol=2e-4
        )


@pytest.mark.parametrize("iters_val", [1, 5])
@pytest.mark.parametrize("zero_jk", [False, True])
def test_apply_kernel_matches_fused_oracle(iters_val, zero_jk):
    factors, mask, g = _random_problem(pad=2, seed=3)
    b = g.shape[0]
    grams = gramians(tuple(factors))
    skip = 1 if not zero_jk else 0
    h = padded_hadamard(hadamard_but_one(grams, skip), mask)
    hinv = normal_inverse_pallas(grams, mask, skip, interpret=True)
    iters = jnp.full((b,), iters_val, jnp.int32)
    jk = jnp.asarray([2, -1, 0, -1, 4, -1][:b], jnp.int32)

    f, lam, gm_raw, t3 = epilogue_apply_pallas(
        g, hinv, iters, jk, zero_jk=zero_jk, with_err=True, interpret=True
    )
    safe = jnp.where(lam != 0, lam, 1.0)
    gm = gm_raw / (safe[..., :, None] * safe[..., None, :])

    # Oracle: the unfused XLA path.
    u_ref = update_factor_unconstrained(g, h)
    if zero_jk:
        u_ref = scale_jk_rows(u_ref, jk, 0.0)
    f_ref, lam_ref, gm_ref = normalize_factor_fused(u_ref, iters)

    np.testing.assert_allclose(
        np.asarray(f), np.asarray(f_ref), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(lam), np.asarray(lam_ref), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(gm), np.asarray(gm_ref), rtol=2e-4, atol=2e-4
    )
    # t3 column sums: hi+lo == sum_i f[i, j] * g[i, j] (exact in f64).
    t3_ref = jnp.einsum(
        "bir,bir->br", f_ref.astype(jnp.float64), g.astype(jnp.float64)
    )
    np.testing.assert_allclose(
        np.asarray(t3[0].astype(jnp.float64) + t3[1].astype(jnp.float64)),
        np.asarray(t3_ref),
        rtol=1e-6,
        atol=1e-6,
    )


def test_fast_error_from_cols_matches_fast_error():
    factors, mask, g = _random_problem(pad=1, seed=7)
    kt_f = tuple(factors)
    lam = jnp.asarray(
        np.random.default_rng(9).normal(size=(g.shape[0], g.shape[-1]))
        .astype(np.float32)
    )
    lam = lam * mask
    grams = gramians(kt_f)
    gh = hadamard_all(grams)
    x_norm = jnp.full((g.shape[0],), 37.5, F32)
    err_ref = fast_error(x_norm, lam, kt_f[1], g, gh)
    # Column sums computed in f64 then split hi/lo exactly representable.
    t3 = jnp.einsum(
        "bir,bir->br", kt_f[1].astype(jnp.float64), g.astype(jnp.float64)
    )
    hi = t3.astype(F32)
    lo = (t3 - hi.astype(jnp.float64)).astype(F32)
    err = fast_error_from_cols(x_norm, lam, hi, lo, gh)
    np.testing.assert_allclose(
        np.asarray(err), np.asarray(err_ref), rtol=5e-5, atol=5e-5
    )


def test_iteration_fused_vs_xla():
    """Full batched iteration: epilogue='fused' (interpret) == 'xla'."""
    import dataclasses

    from cp_cals_tpu.config import CalsParams
    from cp_cals_tpu.solvers.iteration import make_iteration
    from cp_cals_tpu.solvers.state import init_state

    rng = np.random.default_rng(11)
    modes, b, r = (9, 8, 7), 4, 5
    x = jnp.asarray(rng.normal(size=modes).astype(np.float32))
    factors = tuple(
        jnp.asarray(rng.normal(size=(b, m, r)).astype(np.float32)) * 0.3
        for m in modes
    )
    kt = Ktensor(factors, jnp.ones((b, r), F32))
    x_norm = jnp.linalg.norm(x.ravel())
    jk = jnp.asarray([1, -1, 3, -1], jnp.int32)

    states = {}
    for epi in ("fused", "xla"):
        params = CalsParams(
            precision="highest", epilogue=epi, force_max_iter=True,
            max_iterations=100,
        )
        it = make_iteration(params, batched=True)
        prepared = it.prepare(x)
        s = init_state(kt, x_norm, jk_fiber=jk)
        for _ in range(3):
            s = it(x, s, x_norm, prepared)
        states[epi] = s

    for name in ("fit", "approx_error"):
        np.testing.assert_allclose(
            np.asarray(getattr(states["fused"], name)),
            np.asarray(getattr(states["xla"], name)),
            rtol=5e-4, atol=5e-4,
        )
    for f_a, f_b in zip(states["fused"].kt.factors, states["xla"].kt.factors):
        np.testing.assert_allclose(
            np.asarray(f_a), np.asarray(f_b), rtol=5e-3, atol=5e-3
        )


def test_supports_gate():
    assert supports_fused_epilogue(96, 301, 20, jnp.float32)
    assert not supports_fused_epilogue(96, 301, 20, jnp.float64)
    assert not supports_fused_epilogue(96, 301, 200, jnp.float32)
    assert not supports_fused_epilogue(8, 10**6, 20, jnp.float32)
