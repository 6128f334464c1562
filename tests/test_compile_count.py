"""Regression guard on compiled-program diversity.

On the remote-attached TPU backend every distinct XLA program costs a
1-90 s remote compile with NO cross-process cache, so cold-start wall is
roughly proportional to the number of distinct programs a run dispatches.
Round 2 fused the engine's eager op-by-op dispatches (init_state gramians,
per-leaf gathers, stats packing, norm prologue) into a handful of cached
jitted programs — a bench-shaped workload dropped from 96 compiled
programs to ~30. This test pins that behavior: it counts XLA compiles for
a miniature bench-shaped CALS run (multi-bucket, eviction/refill, tail
compaction, spec intake) and fails if the count regresses.

No reference analog (the reference AOT-compiles C++); this guards a
TPU-specific design property (SURVEY §5.7/§7 cold-start economics).
"""

import logging
import re

import jax
import jax.numpy as jnp
import numpy as np

from cp_cals_tpu.config import CalsParams
from cp_cals_tpu.ktensor import RandomKtensorSpec, random_ktensor_host
from cp_cals_tpu.solvers import cp_cals
from cp_cals_tpu.solvers.cals import precompile_buckets


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.names = []

    def emit(self, record):
        m = re.search(r"Compiling jit\(([^)]*)\)", record.getMessage())
        if m:
            self.names.append(m.group(1))


def test_engine_program_count_bounded():
    counter = _CompileCounter()
    logger = logging.getLogger("jax._src.interpreters.pxla")
    logger.addHandler(counter)
    old_level = logger.level
    logger.setLevel(logging.DEBUG)
    jax.config.update("jax_log_compiles", True)
    try:
        modes = (24, 18, 12)
        rng = np.random.default_rng(7)
        kt = random_ktensor_host(rng, modes, 3, dtype=jnp.float32)
        x = jnp.asarray(
            np.einsum("ir,jr,kr,r->ijk", *kt.factors, kt.lam), jnp.float32
        )
        # Two buckets, queue > capacity so eviction/refill and the tail
        # compaction run; spec intake like the bench queue.
        queue = [
            RandomKtensorSpec(modes, r, seed=10 * r + c, dtype="float32")
            for r in (2, 3, 4, 6) for c in range(8)
        ]
        params = CalsParams(
            tol=1e-5,
            max_iterations=10,
            force_max_iter=True,
            buffer_size=96,  # < total padded demand -> refills happen
            bucket_ranks=(4, 8),
            sync_mode="evict",
        )
        precompile_buckets(x, queue, params)
        n_pre = len(counter.names)
        cp_cals(x, queue, params)
        n_total = len(counter.names)
    finally:
        jax.config.update("jax_log_compiles", False)
        logger.removeHandler(counter)
        logger.setLevel(old_level)

    # Program census for this workload (2 buckets): build/run/refill-build
    # per bucket + gathers/masks + the full tail-compaction ladder + norm
    # prologue. The bound is deliberately loose (current count ~34, all
    # warmed proactively); the eager op-by-op regression this guards
    # against tripled it.
    assert n_total <= 40, (
        f"{n_total} compiled programs (was ~34); eager per-op dispatches "
        f"have crept back in: {counter.names}"
    )
    # The threaded precompile pass must cover (essentially) every program —
    # any serial residue compiles one-at-a-time inside the engine loop.
    assert n_total - n_pre <= 4, (
        f"{n_total - n_pre} programs compiled outside precompile_buckets: "
        f"{counter.names[n_pre:]}"
    )
