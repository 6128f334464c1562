"""Kernel-level oracle tests: MTTKRP variants, gramians, error formula.

Variant-equivalence mirrors the reference strategy of running all MTTKRP
methods against each other (tests/als/test_als.cpp:10-60).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cp_cals_tpu.ktensor import (
    Ktensor,
    denormalize,
    normalize_full,
    random_ktensor,
    to_tensor,
)
from cp_cals_tpu.ops import (
    fast_error,
    gramians,
    hadamard_all,
    hadamard_but_one,
    khatri_rao,
    mttkrp,
    mttkrp_batched,
)


def naive_mttkrp(x, factors, mode):
    """Direct summation definition of the MTTKRP."""
    n = x.ndim
    idx = "abcdef"[:n]
    subs = ",".join(f"{idx[m]}r" for m in range(n) if m != mode)
    expr = f"{''.join(idx)},{subs}->{idx[mode]}r"
    others = [factors[m] for m in range(n) if m != mode]
    return jnp.einsum(expr, x, *others)


@pytest.mark.parametrize("mode", [0, 1, 2])
@pytest.mark.parametrize("method", ["krp_gemm", "twostep"])
def test_mttkrp_variants_3d(mode, method):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (7, 5, 6), jnp.float64)
    kt = random_ktensor(k2, (7, 5, 6), 4)
    got = mttkrp(x, kt.factors, mode, method)
    want = naive_mttkrp(x, kt.factors, mode)
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_mttkrp_4d(mode):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (3, 4, 2, 5), jnp.float64)
    kt = random_ktensor(k2, (3, 4, 2, 5), 3)
    for method in ["krp_gemm", "twostep"]:
        got = mttkrp(x, kt.factors, mode, method)
        np.testing.assert_allclose(
            got, naive_mttkrp(x, kt.factors, mode), atol=1e-12
        )


@pytest.mark.parametrize("mode", [0, 1, 2])
@pytest.mark.parametrize("method", ["krp_gemm", "twostep"])
def test_mttkrp_batched_matches_single(mode, method):
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (6, 5, 4), jnp.float64)
    kts = [random_ktensor(k, (6, 5, 4), 3) for k in jax.random.split(k2, 5)]
    kt_b = jax.tree.map(lambda *fs: jnp.stack(fs), *kts)
    got = mttkrp_batched(x, kt_b.factors, mode, method)
    for i, kt in enumerate(kts):
        np.testing.assert_allclose(
            got[i], naive_mttkrp(x, kt.factors, mode), atol=1e-12
        )


@pytest.mark.parametrize("shape", [(4, 5), (3, 4, 2, 5), (2, 3, 4, 2, 3)])
@pytest.mark.parametrize("method", ["krp_gemm", "twostep"])
def test_mttkrp_batched_nd(shape, method):
    """N-D batched variants vs the summation oracle — the twostep TTM+TTV
    chain generalizes past 3-D (unlike the reference, mttkrp.cpp:567-568,
    whose N-D path falls back to the KRP form)."""
    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, shape, jnp.float64)
    kts = [random_ktensor(k, shape, 3) for k in jax.random.split(k2, 4)]
    kt_b = jax.tree.map(lambda *fs: jnp.stack(fs), *kts)
    for mode in range(len(shape)):
        got = mttkrp_batched(x, kt_b.factors, mode, method)
        for i, kt in enumerate(kts):
            np.testing.assert_allclose(
                got[i], naive_mttkrp(x, kt.factors, mode), atol=1e-12
            )


def test_khatri_rao_definition():
    a = jnp.arange(6.0).reshape(3, 2)
    b = jnp.arange(8.0).reshape(4, 2)
    k = khatri_rao(a, b)
    assert k.shape == (12, 2)
    for i in range(3):
        for j in range(4):
            for r in range(2):
                assert k[i * 4 + j, r] == a[i, r] * b[j, r]


def test_padded_columns_are_inert():
    """Zero columns with zero weight must not change the MTTKRP of real cols."""
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (6, 5, 4), jnp.float64)
    kt = random_ktensor(k2, (6, 5, 4), 3)
    from cp_cals_tpu.ktensor import pad_rank

    ktp = pad_rank(kt, 8)
    for mode in range(3):
        g = mttkrp(x, ktp.factors, mode)
        np.testing.assert_allclose(g[:, :3], mttkrp(x, kt.factors, mode), atol=1e-12)
        np.testing.assert_allclose(g[:, 3:], 0.0, atol=0)


def test_fast_error_equals_reconstruction():
    """Fast-error formula == explicit reconstruction error (reference
    tests/als/test_als.cpp:125-145, tolerance 1e-10) — here checked
    algebraically at an arbitrary (normalized) model state with G_last
    consistent with the factors."""
    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (6, 5, 4), jnp.float64)
    kt = random_ktensor(k2, (6, 5, 4), 3)
    g_last = mttkrp(x, kt.factors, 2)
    gr = gramians(kt.factors)
    x_norm = jnp.linalg.norm(x.ravel())
    err = fast_error(x_norm, kt.lam, kt.factors[-1], g_last, hadamard_all(gr))
    xhat = to_tensor(kt)
    want = jnp.linalg.norm((x - xhat).ravel())
    np.testing.assert_allclose(float(err), float(want), rtol=1e-10)


def test_normalize_denormalize_roundtrip():
    key = jax.random.PRNGKey(5)
    kt = random_ktensor(key, (6, 5, 4), 3)
    rt = normalize_full(denormalize(kt))
    np.testing.assert_allclose(to_tensor(rt), to_tensor(kt), atol=1e-12)


def test_hadamard_but_one():
    key = jax.random.PRNGKey(6)
    kt = random_ktensor(key, (6, 5, 4), 3)
    gr = gramians(kt.factors)
    want = gr[0] * gr[2]
    np.testing.assert_allclose(hadamard_but_one(gr, 1), want, atol=1e-14)


def test_fast_error_compensated_f32():
    """The double-float fp32 error reduction survives the catastrophic
    cancellation (|X|^2 + term2 - 2*term3 with result ~1e-6*|X|^2): it must
    match an fp64 evaluation of the SAME f32 inputs to several digits,
    where the naive f32 formula has no digits left (SURVEY §7 hard part,
    reference error.cpp:64-89 is all-double)."""
    from cp_cals_tpu.ops.error import _fast_error_compensated
    from cp_cals_tpu.ops.mttkrp import mttkrp

    key = jax.random.PRNGKey(31)
    kx, kn = jax.random.split(key)
    kt = random_ktensor(kx, (30, 25, 20), 5)
    x = to_tensor(kt)
    # err/|X| ~ 3e-4 -> err^2/|X|^2 ~ 1e-7: needs ~12 good digits.
    x = x + 3e-4 * jnp.std(x) * jax.random.normal(kn, x.shape, x.dtype)

    g_last = mttkrp(x, kt.factors, 2)
    gh = hadamard_all(gramians(kt.factors))
    x_norm = jnp.linalg.norm(x.ravel())

    # Cast ALL inputs to f32 (what the TPU path sees).
    f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
    got = _fast_error_compensated(
        f32(x_norm), f32(kt.lam), f32(kt.factors[2]), f32(g_last), f32(gh)
    )

    # fp64 oracle on the identical f32 inputs.
    lam64 = np.asarray(f32(kt.lam), np.float64)
    u64 = np.asarray(f32(kt.factors[2]), np.float64)
    g64 = np.asarray(f32(g_last), np.float64)
    h64 = np.asarray(f32(gh), np.float64)
    xn64 = np.float64(np.float32(x_norm))
    term2 = lam64 @ h64 @ lam64
    term3 = np.einsum("j,ij,ij->", lam64, u64, g64)
    want = np.sqrt(max(xn64 * xn64 + term2 - 2.0 * term3, 0.0))

    assert xn64**2 / want**2 > 1e5  # the cancellation is genuinely severe
    np.testing.assert_allclose(float(got), want, rtol=1e-4)

    # Batched shapes take the same path.
    got_b = _fast_error_compensated(
        jnp.stack([f32(x_norm)] * 2),
        jnp.stack([f32(kt.lam)] * 2),
        jnp.stack([f32(kt.factors[2])] * 2),
        jnp.stack([f32(g_last)] * 2),
        jnp.stack([f32(gh)] * 2),
    )
    np.testing.assert_allclose(np.asarray(got_b), [want, want], rtol=1e-4)


def test_spd_solve_variants_agree():
    """gj_inverse / cholesky_inverse / Pallas (interpret) vs numpy.linalg.inv,
    including an ill-conditioned SPD system — the solve variants behind
    update_factor_unconstrained (reference update.cpp:178-192)."""
    from cp_cals_tpu.ops.pallas_solve import spd_inverse_pallas
    from cp_cals_tpu.ops.update import cholesky_inverse, gj_inverse

    rng = np.random.default_rng(3)
    for r, jitter in ((4, 1.0), (20, 1.0), (20, 1e-6)):
        a = rng.normal(size=(6, r, r))
        h = jnp.asarray(a @ np.transpose(a, (0, 2, 1)) + jitter * np.eye(r))
        want = np.linalg.inv(np.asarray(h))
        scale = np.abs(want).max()
        for got in (gj_inverse(h), cholesky_inverse(h)):
            rel = np.abs(np.asarray(got, np.float64) - want).max() / scale
            assert rel < 1e-5, rel
        # fp32 kernel: error bound scales with the condition number.
        got = spd_inverse_pallas(h.astype(jnp.float32), interpret=True)
        cond = np.linalg.cond(np.asarray(h)).max()
        rel = np.abs(np.asarray(got, np.float64) - want).max() / scale
        assert rel < 100 * cond * np.finfo(np.float32).eps, (rel, cond)


def test_update_solve_methods_equivalent():
    """update_factor_unconstrained gives the same factor for every solve."""
    from cp_cals_tpu.ops.update import update_factor_unconstrained

    rng = np.random.default_rng(4)
    b, i, r = 5, 17, 8
    a = rng.normal(size=(b, r, r))
    h = jnp.asarray(a @ np.transpose(a, (0, 2, 1)) + r * np.eye(r))
    g = jnp.asarray(rng.normal(size=(b, i, r)))
    u_gj = np.asarray(update_factor_unconstrained(g, h, solve="gj"))
    u_ch = np.asarray(update_factor_unconstrained(g, h, solve="chol"))
    np.testing.assert_allclose(u_gj, u_ch, rtol=1e-9, atol=1e-9)


def test_normalize_factor_fused_matches_unfused():
    """normalize_factor_fused == normalize_mode + gramian (both iteration
    regimes: L2 at iteration 1, signed-max after)."""
    from cp_cals_tpu.ktensor import normalize_factor_fused, normalize_mode
    from cp_cals_tpu.ops.gramians import gramian

    rng = np.random.default_rng(5)
    f = jnp.asarray(rng.normal(size=(3, 11, 6)))
    f = f.at[:, :, -1].set(0.0)  # padded column stays inert
    lam = jnp.ones((3, 6), f.dtype)
    for it in (1, 7):
        iters = jnp.full((3,), it, jnp.int32)
        kt = normalize_mode(Ktensor((f,), lam), 0, iters)
        want_f, want_lam = kt.factors[0], kt.lam
        want_g = gramian(want_f)
        got_f, got_lam, got_g = normalize_factor_fused(f, iters)
        np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_lam), np.asarray(want_lam),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                                   rtol=1e-12, atol=1e-12)


def test_twostep_batched_matches_single_tied_small_modes():
    """N-D twostep with TIED small-mode sizes: the batched TTV chain and
    the single-model path must contract in the same order (ties toward
    the highest index), or CALS == ALS drifts above the bit-match band.
    Modes (8, 5, 5, 4), target 3: big = 0, small = [1, 2] tied at 5."""
    import numpy as np

    from cp_cals_tpu.ops.mttkrp import mttkrp, mttkrp_batched

    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 5)
    modes = (8, 5, 5, 4)
    x = jax.random.normal(ks[0], modes, jnp.float64)
    factors_b = tuple(
        jax.random.normal(k, (3, m, 2), jnp.float64)
        for k, m in zip(ks[1:], modes)
    )
    for mode in range(4):
        g_b = mttkrp_batched(x, factors_b, mode, "twostep")
        for i in range(3):
            f1 = tuple(f[i] for f in factors_b)
            g_1 = mttkrp(x, f1, mode, "twostep")
            np.testing.assert_array_equal(
                np.asarray(g_b[i]), np.asarray(g_1)
            )
