"""Pallas fused MTTKRP kernel vs the XLA reference path (interpret mode).

Compiled-mode equivalence runs on real TPU hardware (the CPU backend can
only interpret Mosaic kernels); interpret mode validates the kernel's math,
tiling and padding logic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cp_cals_tpu.ops.mttkrp import mttkrp_batched_krp
from cp_cals_tpu.ops.pallas_mttkrp import (
    mttkrp_batched_pallas,
    prepare_mode_tensor,
)


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_pallas_matches_krp(mode):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    modes = (30, 40, 24)
    b, r = 10, 16
    x = jax.random.normal(ks[0], modes, jnp.float32)
    factors = tuple(
        jax.random.normal(k, (b, m, r), jnp.float32)
        for k, m in zip(ks[1:], modes)
    )
    want = mttkrp_batched_krp(x, factors, mode)
    got = mttkrp_batched_pallas(x, factors, mode, interpret=True, ti=16)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-4
    )


def test_pallas_prepared_tensor(mode=1):
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    modes = (16, 24, 40)
    b, r = 6, 8
    x = jax.random.normal(ks[0], modes, jnp.float32)
    factors = tuple(
        jax.random.normal(k, (b, m, r), jnp.float32)
        for k, m in zip(ks[1:], modes)
    )
    prep = prepare_mode_tensor(x, mode, ti=16)
    want = mttkrp_batched_krp(x, factors, mode)
    got = mttkrp_batched_pallas(
        x, factors, mode, prepared=prep, interpret=True, ti=16
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-4
    )


def test_pallas_odd_rank_padding():
    """Odd ranks force db = 128; exercise the alignment picker."""
    from cp_cals_tpu.ops.pallas_mttkrp import _pick_db

    assert _pick_db(16) * 16 % 128 == 0
    assert _pick_db(20) * 20 % 128 == 0
    assert _pick_db(19) * 19 % 128 == 0


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_pallas_row_tiling(mode):
    """Multi-tile target mode (ip > ti) exercises grid accumulation."""
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 4)
    modes = (40, 36, 20)
    b, r = 4, 8
    x = jax.random.normal(ks[0], modes, jnp.float32)
    factors = tuple(
        jax.random.normal(k, (b, m, r), jnp.float32)
        for k, m in zip(ks[1:], modes)
    )
    want = mttkrp_batched_krp(x, factors, mode)
    got = mttkrp_batched_pallas(x, factors, mode, interpret=True, ti=8, cj=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-4
    )
