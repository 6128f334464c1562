"""Interleaved A/B: XLA twostep vs Pallas fused-twostep MTTKRP.

The session chip is shared and its throughput varies 2-3x (sometimes 10x)
run to run, so only interleaved measurement is meaningful (docs/PROFILE.md):
each rep times both variants back-to-back and the report takes min-of-reps
per variant plus the per-rep ratio distribution. Follows the
hoist/DCE/scalar-fetch discipline from docs/PROFILE.md.

Usage: python scripts/bench_pallas_ab.py [R] [B] [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cp_cals_tpu.ops.mttkrp import mttkrp_batched, prepare_batched
from cp_cals_tpu.ops.pallas_mttkrp import (
    mttkrp_batched_pallas,
    prepare_mode_tensor,
)

MODES = (299, 301, 41)
N_LOOP = 20


def make_fn(x, mode, variant, prec_name):
    other = [m for m in range(3) if m != mode][0]
    if variant == "twostep":
        prepared = prepare_batched(x, ("twostep",) * 3)[mode]
        prec = {
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[prec_name]

        def call(x, f):
            return mttkrp_batched(x, f, mode, "twostep", prec, prepared)

    else:
        prepared = prepare_mode_tensor(x, mode)

        def call(x, f):
            return mttkrp_batched_pallas(
                x, f, mode, prepared=prepared, precision=prec_name
            )

    def run_fn(x, f):
        def body(i, f):
            g = call(x, f)
            fo = f[other] + jnp.sum(g, axis=-2, keepdims=True) * 1e-20
            return f[:other] + (fo,) + f[other + 1 :]

        out = jax.lax.fori_loop(0, N_LOOP, body, f)
        return jnp.sum(out[other][..., 0, :]) * 1e-20

    return jax.jit(run_fn)


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    prec = sys.argv[4] if len(sys.argv) > 4 else "high"
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], MODES, jnp.float32)
    factors = tuple(
        jax.random.normal(k, (b, m, r), jnp.float32)
        for k, m in zip(ks[1:], MODES)
    )
    flops = 2 * np.prod(MODES) * b * r
    for mode in range(3):
        fns = {
            v: make_fn(x, mode, v, prec) for v in ("twostep", "pallas")
        }
        for fn in fns.values():  # compile
            float(np.asarray(fn(x, factors)))
        best = {v: float("inf") for v in fns}
        ratios = []
        for _ in range(reps):
            t = {}
            for v, fn in fns.items():  # interleaved back-to-back
                t0 = time.perf_counter()
                float(np.asarray(fn(x, factors)))
                t[v] = (time.perf_counter() - t0) / N_LOOP
                best[v] = min(best[v], t[v])
            ratios.append(t["twostep"] / t["pallas"])
        print(
            f"mode={mode} prec={prec}: "
            f"twostep {best['twostep']*1e3:.2f} ms "
            f"({flops/best['twostep']/1e12:.0f} TF/s) | "
            f"pallas {best['pallas']*1e3:.2f} ms "
            f"({flops/best['pallas']/1e12:.0f} TF/s) | "
            f"ratio med {np.median(ratios):.2f} "
            f"[{min(ratios):.2f}..{max(ratios):.2f}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
