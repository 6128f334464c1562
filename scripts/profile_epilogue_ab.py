"""A/B the fused Pallas epilogue vs the XLA path, component by component.

Same-process interleaved measurement (shared-chip noise hits both sides),
methodology per docs/PROFILE.md: chained fori_loop, scalar fetch, best-of.

Usage: python scripts/profile_epilogue_ab.py [--batch 96] [--rank 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

NULL = [0.0]


def timed(fn, args, n_loop, reps=4):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(np.asarray(out).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jfn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - NULL[0], best / 10) / n_loop


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="299-301-41")
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--rank", type=int, default=20)
    p.add_argument("--n-loop", type=int, default=20)
    p.add_argument("--out", default="data/benchmarks/epilogue_ab.json")
    args = p.parse_args()

    from cp_cals_tpu.config import CalsParams
    from cp_cals_tpu.ktensor import Ktensor, normalize_factor_fused, scale_jk_rows
    from cp_cals_tpu.ops.gramians import gramians, hadamard_but_one
    from cp_cals_tpu.ops.pallas_epilogue import (
        epilogue_apply_pallas,
        normal_inverse_pallas,
    )
    from cp_cals_tpu.ops.update import (
        padded_hadamard,
        update_factor_unconstrained,
    )
    from cp_cals_tpu.solvers.iteration import make_iteration
    from cp_cals_tpu.solvers.state import init_state

    modes = tuple(int(m) for m in args.modes.split("-"))
    b, r, n_loop = args.batch, args.rank, args.n_loop
    dtype = jnp.float32
    print(f"device: {jax.devices()[0]} modes {modes} B={b} R={r}", flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, len(modes) + 2)
    x = jax.random.normal(ks[0], modes, dtype)
    factors = tuple(
        jax.random.normal(k, (b, m, r), dtype) * 0.1
        for k, m in zip(ks[1:], modes)
    )
    kt = Ktensor(factors, jnp.ones((b, r), dtype))
    x_norm = jnp.linalg.norm(x.ravel())
    grams = gramians(factors)
    mask = jnp.ones((b, r), bool)
    iters = jnp.full((b,), 5, jnp.int32)
    jk = jnp.full((b,), -1, jnp.int32)
    g0 = jax.random.normal(ks[-1], (b, modes[0], r), dtype)

    res = {"modes": modes, "batch": b, "rank": r}

    @jax.jit
    def _null(a):
        return jnp.sum(a) * 1e-30

    z = jnp.zeros((8, 128), dtype)
    float(np.asarray(_null(z)))
    lat = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(_null(z)))
        lat = min(lat, time.perf_counter() - t0)
    NULL[0] = lat
    res["null_ms"] = lat * 1e3
    print(f"null {lat*1e3:.1f} ms", flush=True)

    # ---- full iteration A/B --------------------------------------------
    for epi in ("xla", "fused"):
        params = CalsParams(precision="high", force_max_iter=True,
                            max_iterations=10**9, epilogue=epi)
        it = make_iteration(params, batched=True)
        prepared = it.prepare(x)
        s0 = init_state(kt, x_norm)

        def chain(s0, it=it, prepared=prepared):
            def step(i, s):
                return it(x, s, x_norm, prepared)
            return jax.lax.fori_loop(0, n_loop, step, s0).fit[0]

        t = timed(chain, (s0,), n_loop)
        res[f"iteration_{epi}_ms"] = t * 1e3
        print(f"iteration[{epi}]: {t*1e3:8.3f} ms", flush=True)

    # ---- inverse kernel vs XLA gj --------------------------------------
    def inv_pallas_chain(g_in):
        def step(i, gg):
            hinv = normal_inverse_pallas((gg,) + grams[1:], mask, 1)
            return gg + hinv * 1e-30
        out = jax.lax.fori_loop(0, n_loop, step, g_in)
        return jnp.sum(out[0]) * 1e-20

    def inv_xla_chain(g_in):
        def step(i, gg):
            from cp_cals_tpu.ops.update import gj_inverse
            h = padded_hadamard(hadamard_but_one((gg,) + grams[1:], 1), mask)
            return gg + gj_inverse(h) * 1e-30
        out = jax.lax.fori_loop(0, n_loop, step, g_in)
        return jnp.sum(out[0]) * 1e-20

    t = timed(inv_pallas_chain, (grams[0],), n_loop)
    res["inverse_pallas_ms"] = t * 1e3
    print(f"inverse pallas: {t*1e3:8.3f} ms", flush=True)
    t = timed(inv_xla_chain, (grams[0],), n_loop)
    res["inverse_xla_ms"] = t * 1e3
    print(f"inverse xla-gj: {t*1e3:8.3f} ms", flush=True)

    # ---- apply kernel vs XLA epilogue (one mode, mode 0) ----------------
    hinv0 = normal_inverse_pallas(grams, mask, 0)

    for with_err in (False, True):
        def apply_chain(g_in, we=with_err):
            def step(i, gg):
                f, lam, gm_raw, t3 = epilogue_apply_pallas(
                    gg, hinv0, iters, jk, zero_jk=True, with_err=we,
                )
                extra = (t3[0][0, 0] if we else 0.0)
                return gg + f * 1e-30 + (
                    gm_raw[..., :1, :] + lam[..., None, :] + extra
                ) * 1e-30
            out = jax.lax.fori_loop(0, n_loop, step, g_in)
            return jnp.sum(out[0]) * 1e-20

        t = timed(apply_chain, (g0,), n_loop)
        res[f"apply_pallas_err{int(with_err)}_ms"] = t * 1e3
        print(f"apply pallas (err={with_err}): {t*1e3:8.3f} ms", flush=True)

    def apply_xla_chain(g_in):
        h = padded_hadamard(hadamard_but_one(grams, 0), mask)

        def step(i, gg):
            u = update_factor_unconstrained(gg, h)
            u = scale_jk_rows(u, jk, 0.0)
            f, lam, gm = normalize_factor_fused(u, iters)
            return gg + f * 1e-30 + (
                gm[..., :1, :] + lam[..., None, :]
            ) * 1e-30
        out = jax.lax.fori_loop(0, n_loop, step, g_in)
        return jnp.sum(out[0]) * 1e-20

    t = timed(apply_xla_chain, (g0,), n_loop)
    res["apply_xla_ms"] = t * 1e3
    print(f"apply xla (no solve-h): {t*1e3:8.3f} ms", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
