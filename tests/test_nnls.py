"""NNLS solver unit tests: BPP vs Lawson-Hanson vs brute force.

Both algorithms solve min_{d>=0} 1/2 d^T H d - y^T d for SPD H; the solution
is unique, so they must agree with each other and with an exhaustive
active-set search on small problems.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cp_cals_tpu.ops.update import update_factor_nnls


def brute_force_nnls(h, y):
    """Enumerate active sets; pick the feasible KKT point."""
    r = len(y)
    best = None
    for mask in itertools.product([False, True], repeat=r):
        passive = np.array(mask)
        if passive.sum() == 0:
            d = np.zeros(r)
        else:
            d = np.zeros(r)
            hp = h[np.ix_(passive, passive)]
            d[passive] = np.linalg.solve(hp, y[passive])
        if (d < -1e-9).any():
            continue
        w = y - h @ d
        if (w[~passive] > 1e-9).any() if (~passive).any() else False:
            continue
        best = d
        break
    assert best is not None
    return best


def make_spd(rng, r, cond=10.0):
    a = rng.normal(size=(r, r))
    h = a @ a.T + np.eye(r) / cond
    return h


@pytest.mark.parametrize("algorithm", ["bpp", "lawson_hanson"])
def test_nnls_matches_bruteforce(algorithm):
    rng = np.random.default_rng(0)
    for trial in range(20):
        r = int(rng.integers(2, 6))
        h = make_spd(rng, r)
        y = rng.normal(size=r)
        d, _ = update_factor_nnls(
            jnp.asarray(y)[None, None, :],
            jnp.asarray(h)[None],
            jnp.ones((1, 1, r), bool),
            algorithm=algorithm,
        )
        want = brute_force_nnls(h, y)
        np.testing.assert_allclose(
            np.asarray(d)[0, 0], want, atol=1e-8, err_msg=f"trial {trial}"
        )


def test_bpp_equals_lawson_hanson_batched():
    rng = np.random.default_rng(1)
    b, i, r = 4, 6, 5
    h = np.stack([make_spd(rng, r) for _ in range(b)])
    g = rng.normal(size=(b, i, r))
    warm = np.ones((b, i, r), bool)
    d1, _ = update_factor_nnls(
        jnp.asarray(g), jnp.asarray(h), jnp.asarray(warm), algorithm="bpp"
    )
    d2, _ = update_factor_nnls(
        jnp.asarray(g), jnp.asarray(h), jnp.asarray(warm),
        algorithm="lawson_hanson",
    )
    assert float(jnp.min(d1)) >= 0.0
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-8)


def test_nnls_warm_start_consistency():
    """A warm start from the previous solution must reproduce it."""
    rng = np.random.default_rng(2)
    r = 5
    h = make_spd(rng, r)
    y = rng.normal(size=r)
    d1, act = update_factor_nnls(
        jnp.asarray(y)[None, None, :], jnp.asarray(h)[None],
        jnp.ones((1, 1, r), bool),
    )
    d2, _ = update_factor_nnls(
        jnp.asarray(y)[None, None, :], jnp.asarray(h)[None], act
    )
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-10)
